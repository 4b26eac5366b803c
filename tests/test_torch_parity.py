"""Numerical forward parity: Flax models vs the reference's torch networks.

This is the strongest parity proof available in this environment (no dataset,
no ImageNet weights, but CPU torch IS in the image): instantiate the
reference's exact torch architectures (tests/torch_ref_models.py, rebuilt from
/root/reference/src/unet_models.py), randomize weights AND BatchNorm running
stats, convert the state_dict with mapping_tpu.models.torch_convert, and
assert the Flax forward agrees in float32 — per encoder stage and on full
logits. A pass means real pretrained/trained reference checkpoints will
reproduce bit-comparable predictions; any BN-eps / stride-placement / stem
pooling / deconv-padding divergence fails loudly here.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mapping_tpu.models.resnet import ResNetEncoder
from mapping_tpu.models.unet_resnet import AlbuNet, UNetResNet
from mapping_tpu.models.vgg import UNet11, UNetVGG16
from mapping_tpu.models.torch_convert import (
    convert_albunet,
    convert_resnet_encoder,
    convert_unet11,
    convert_unet_resnet,
    convert_unet_vgg16,
    strip_module_prefix,
)
from tests.torch_ref_models import (
    TorchUNet11,
    TorchUNetResNet,
    TorchUNetVGG16,
    randomize_bn_stats,
)

pytestmark = pytest.mark.slow

torch.set_num_threads(2)


def _state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _to_nchw(y_nhwc):
    return np.transpose(np.asarray(y_nhwc), (0, 3, 1, 2))


def _input(seed, n=1, c=3, hw=64):
    return np.random.RandomState(seed).randn(n, c, hw, hw).astype(np.float32)


def _max_err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


@pytest.mark.parametrize("depth", [34, 101, 152])
def test_resnet_encoder_stage_parity(depth):
    torch.manual_seed(depth)
    tmodel = randomize_bn_stats(TorchUNetResNet(depth), seed=depth).eval()
    x = _input(depth, hw=64)
    with torch.no_grad():
        tstages = tmodel.stages(torch.from_numpy(x))

    params, stats = convert_resnet_encoder(
        {k[len("encoder."):]: v for k, v in _state(tmodel).items()
         if k.startswith("encoder.")},
        depth,
    )
    enc = ResNetEncoder(depth, dtype=jnp.float32)
    jstages = enc.apply(
        {"params": params, "batch_stats": stats}, _nhwc(x), train=False
    )
    assert len(jstages) == 5
    for i, (tj, jj) in enumerate(zip(tstages, jstages)):
        err = _max_err(tj.numpy(), _to_nchw(jj))
        assert err < 1e-4, f"stage {i + 1} (depth {depth}): max err {err}"


@pytest.mark.parametrize(
    "depth,is_deconv", [(34, True), (34, False), (101, True), (152, True)]
)
def test_unet_resnet_full_forward_parity(depth, is_deconv):
    torch.manual_seed(100 + depth)
    tmodel = randomize_bn_stats(
        TorchUNetResNet(depth, num_classes=2, is_deconv=is_deconv), seed=depth
    ).eval()
    x = _input(7 + depth, hw=64)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x)).numpy()

    params, stats = convert_unet_resnet(_state(tmodel), depth, is_deconv)
    model = UNetResNet(encoder_depth=depth, num_classes=2, dropout_2d=0.0,
                       is_deconv=is_deconv, dtype=jnp.float32)
    jy = model.apply(
        {"params": params, "batch_stats": stats}, _nhwc(x), train=False
    )
    err = _max_err(ty, _to_nchw(jy))
    assert err < 1e-3, f"UNetResNet{depth} is_deconv={is_deconv}: max err {err}"


def test_albunet_forward_parity():
    torch.manual_seed(5)
    tmodel = randomize_bn_stats(
        TorchUNetResNet(34, num_classes=2, is_deconv=True), seed=5
    ).eval()
    x = _input(11, hw=64)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x)).numpy()
    params, stats = convert_albunet(_state(tmodel), is_deconv=True)
    jy = AlbuNet(num_classes=2, is_deconv=True, dtype=jnp.float32).apply(
        {"params": params, "batch_stats": stats}, _nhwc(x), train=False
    )
    assert _max_err(ty, _to_nchw(jy)) < 1e-3


def test_unet11_forward_parity():
    torch.manual_seed(3)
    tmodel = TorchUNet11(num_classes=2).eval()
    x = _input(13, hw=64)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x)).numpy()
    params = convert_unet11(_state(tmodel))
    jy = UNet11(num_classes=2, dtype=jnp.float32).apply(
        {"params": params}, _nhwc(x), train=False
    )
    err = _max_err(ty, _to_nchw(jy))
    assert err < 1e-3, f"UNet11: max err {err}"


@pytest.mark.parametrize("is_deconv", [True, False])
def test_unet_vgg16_forward_parity(is_deconv):
    torch.manual_seed(4)
    tmodel = TorchUNetVGG16(num_classes=2, is_deconv=is_deconv).eval()
    x = _input(17, hw=64)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x)).numpy()
    params = convert_unet_vgg16(_state(tmodel), is_deconv)
    jy = UNetVGG16(num_classes=2, dropout_2d=0.0, is_deconv=is_deconv,
                   dtype=jnp.float32).apply(
        {"params": params}, _nhwc(x), train=False
    )
    err = _max_err(ty, _to_nchw(jy))
    assert err < 1e-3, f"UNetVGG16 is_deconv={is_deconv}: max err {err}"


def test_dataparallel_prefix_stripped():
    state = {"module.final.weight": np.zeros((2, 32, 1, 1)),
             "final.bias": np.zeros((2,))}
    out = strip_module_prefix(state)
    assert set(out) == {"final.weight", "final.bias"}
