"""torchvision state_dict -> Flax params conversion for pretrained encoders.

The reference downloads ImageNet-pretrained torchvision encoders at model
construction (src/unet_models.py:345-352, src/models.py:22-47). This
environment has no torchvision and no network egress, so pretrained weights
arrive, when they arrive, as a `.pth`/`.npz` file on disk; this module maps
its tensors onto our Flax parameter tree. Without a weights file models train
from random init (he-normal, the reference's fallback at
src/steps/pytorch/models.py:35-48).

Layout conversion: torch conv weights are (O, I, kH, kW) -> flax (kH, kW, I, O);
linear (O, I) -> (I, O); BN weight/bias/running_mean/running_var ->
scale/bias/mean/var (params vs batch_stats collections).
"""

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth/.pt state_dict or a .npz into {name: ndarray}."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return {k: f[k] for k in f.files}
    import torch  # CPU torch is available in this image

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def convert_resnet_encoder(
    state: Mapping[str, np.ndarray], depth: int
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision resnet{34,101,152} state_dict -> (params, batch_stats)
    subtrees for mapping_tpu.models.resnet.ResNetEncoder.

    Naming: torch `layerL.B.convI` -> flax `layerL_{B}/convI`;
    `layerL.B.downsample.{0,1}` -> `layerL_{B}/downsample_{conv,bn}`.
    """
    from mapping_tpu.models.resnet import _CONFIGS

    _, layers, _ = _CONFIGS[depth]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def bn(src_prefix, dst_path):
        put(params, dst_path + ("scale",), np.asarray(state[src_prefix + ".weight"]))
        put(params, dst_path + ("bias",), np.asarray(state[src_prefix + ".bias"]))
        put(stats, dst_path + ("mean",), np.asarray(state[src_prefix + ".running_mean"]))
        put(stats, dst_path + ("var",), np.asarray(state[src_prefix + ".running_var"]))

    put(params, ("conv1", "kernel"), _conv(state["conv1.weight"]))
    bn("bn1", ("bn1",))

    is_bottleneck = depth >= 50
    n_convs = 3 if is_bottleneck else 2
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            for ci in range(1, n_convs + 1):
                put(params, (dst, f"conv{ci}", "kernel"),
                    _conv(state[f"{src}.conv{ci}.weight"]))
                bn(f"{src}.bn{ci}", (dst, f"bn{ci}"))
            if f"{src}.downsample.0.weight" in state:
                put(params, (dst, "downsample_conv", "kernel"),
                    _conv(state[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", (dst, "downsample_bn"))
    return params, stats


def convert_vgg_features(
    state: Mapping[str, np.ndarray]
) -> Dict[str, Dict[str, np.ndarray]]:
    """torchvision vgg `features.N.{weight,bias}` -> {conv_N: {kernel, bias}}.

    Our VGG U-Nets name convs by their torchvision features index
    (models/vgg.py), so this is a rename + transpose.
    """
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in state.items():
        parts = key.split(".")
        if parts[0] == "features" and parts[-1] in ("weight", "bias"):
            idx = parts[1]
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            out.setdefault(f"conv_{idx}", {})[leaf] = (
                _conv(value) if leaf == "kernel" else np.asarray(value)
            )
    return out


def graft_encoder_params(model_params, encoder_tree, path=("encoder",)):
    """Return model_params with the subtree at `path` replaced by
    `encoder_tree` (converted pretrained weights); shapes are validated."""
    import jax

    node = model_params
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]

    def check(a, b):
        if np.shape(a) != np.shape(b):
            raise ValueError(f"shape mismatch grafting encoder: {np.shape(a)} vs {np.shape(b)}")
        return np.asarray(b, dtype=np.asarray(a).dtype)

    grafted = jax.tree_util.tree_map(check, old, encoder_tree)
    out = dict(model_params)
    cursor = out
    for p in path[:-1]:
        cursor[p] = dict(cursor[p])
        cursor = cursor[p]
    cursor[path[-1]] = grafted
    return out
