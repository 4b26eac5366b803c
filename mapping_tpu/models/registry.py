"""Model registry mirroring the reference's PRETRAINED_NETWORKS
(src/models.py:22-47) plus the 'from_scratch' parametric UNet path
(src/models.py:94-101).

`build_network(model_params)` returns an *instantiated Flax module*; callers
init/apply it functionally. `encoder` selects the family; remaining
model_params (num_filters, dropout, ...) override the registry defaults.
"""

from typing import Any, Dict

import jax.numpy as jnp

from mapping_tpu.models.scratch import UNet, UNetMultitask
from mapping_tpu.models.unet_resnet import AlbuNet, UNetResNet
from mapping_tpu.models.vgg import UNet11, UNetVGG16

PRETRAINED_NETWORKS: Dict[str, Dict[str, Any]] = {
    "VGG11": {
        "model": UNet11,
        "model_config": {"num_classes": 2},
    },
    "VGG16": {
        "model": UNetVGG16,
        "model_config": {"num_classes": 2, "dropout_2d": 0.0, "is_deconv": True},
    },
    "AlbuNet": {
        "model": AlbuNet,
        "model_config": {"num_classes": 2, "is_deconv": True},
    },
    "ResNet34": {
        "model": UNetResNet,
        "model_config": {"encoder_depth": 34, "num_classes": 2,
                         "num_filters": 32, "dropout_2d": 0.0,
                         "is_deconv": True},
    },
    "ResNet101": {
        "model": UNetResNet,
        "model_config": {"encoder_depth": 101, "num_classes": 2,
                         "num_filters": 32, "dropout_2d": 0.0,
                         "is_deconv": True},
    },
    "ResNet152": {
        "model": UNetResNet,
        "model_config": {"encoder_depth": 152, "num_classes": 2,
                         "num_filters": 32, "dropout_2d": 0.0,
                         "is_deconv": True},
    },
}

_SCRATCH_KEYS = (
    "conv_kernel", "pool_kernel", "pool_stride", "repeat_blocks", "n_filters",
    "batch_norm", "dropout", "in_channels", "out_channels", "nr_outputs",
)


def build_network(model_params: Dict[str, Any], dtype=jnp.bfloat16):
    """model_params mirrors the reference's architecture_config['model_params'].

    Keys: 'encoder' ('from_scratch' or a PRETRAINED_NETWORKS name) plus
    optional per-family overrides. Returns an un-initialized Flax module.
    """
    params = dict(model_params)
    dtype = params.pop("dtype", dtype)
    if isinstance(dtype, str):
        dtype = getattr(jnp, dtype)
    encoder = params.pop("encoder", "ResNet101")
    if encoder == "from_scratch":
        cfg = {k: params[k] for k in _SCRATCH_KEYS if k in params}
        cls = UNetMultitask if cfg.get("nr_outputs", 1) > 1 else UNet
        return cls(dtype=dtype, **cfg)
    if encoder == "UNetPlusPlus":
        from mapping_tpu.models.unetpp import UNetPlusPlus

        cfg = {k: params[k] for k in
               ("num_classes", "n_filters", "depth", "deep_supervision")
               if k in params}
        cfg.setdefault("num_classes", params.get("out_channels", 2))
        return UNetPlusPlus(dtype=dtype, **cfg)
    if encoder not in PRETRAINED_NETWORKS:
        raise KeyError(
            f"unknown encoder {encoder!r}; options: "
            f"{sorted(PRETRAINED_NETWORKS)} or 'from_scratch'"
        )
    spec = PRETRAINED_NETWORKS[encoder]
    cfg = dict(spec["model_config"])
    for k in list(params):
        if k in cls_fields(spec["model"]):
            cfg[k] = params.pop(k)
    return spec["model"](dtype=dtype, **cfg)


def cls_fields(cls):
    return {f for f in getattr(cls, "__dataclass_fields__", {})}
