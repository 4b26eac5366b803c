"""VGG-encoder U-Nets: UNet11 (TernausNet) and UNetVGG16.

Parity targets: reference UNet11 (src/unet_models.py:56-106) and UNetVGG16
(src/unet_models.py:224-312). VGG features have no batch norm; encoder stages
are plain conv+ReLU groups separated by 2x2 max pools. NHWC / bfloat16.

Parameter names mirror torchvision vgg11/vgg16 `features` indices
(conv_0, conv_3, ... for vgg11; conv_0, conv_2, conv_5, ... for vgg16) so a
state_dict converts mechanically (models/torch_convert.py).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mapping_tpu.models.blocks import ConvRelu, DecoderBlock, DecoderBlockV2, SpatialDropout

Dtype = Any


def _conv3(features, dtype, name):
    return nn.Conv(features, (3, 3), padding="SAME", dtype=dtype, name=name)


def _pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class VGGStage(nn.Module):
    """A run of 3x3 conv+ReLU layers (one VGG stage, between pools)."""

    features: int
    n_convs: int
    conv_indices: Sequence[int]  # torchvision `features` indices, for naming
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            x = _conv3(self.features, self.dtype, f"conv_{self.conv_indices[i]}")(x)
            x = nn.relu(x)
        return x


class UNet11(nn.Module):
    """TernausNet: U-Net with VGG11 encoder (reference src/unet_models.py:56-106)."""

    num_classes: int = 2
    num_filters: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        d = self.dtype
        x = x.astype(d)
        conv1 = nn.relu(_conv3(64, d, "conv_0")(x))
        conv2 = nn.relu(_conv3(128, d, "conv_3")(_pool(conv1)))
        c = nn.relu(_conv3(256, d, "conv_6")(_pool(conv2)))
        conv3 = nn.relu(_conv3(256, d, "conv_8")(c))
        c = nn.relu(_conv3(512, d, "conv_11")(_pool(conv3)))
        conv4 = nn.relu(_conv3(512, d, "conv_13")(c))
        c = nn.relu(_conv3(512, d, "conv_16")(_pool(conv4)))
        conv5 = nn.relu(_conv3(512, d, "conv_18")(c))

        dec = DecoderBlock(nf * 16, nf * 8, d, name="center")(_pool(conv5))
        dec = DecoderBlock(nf * 16, nf * 8, d, name="dec5")(
            jnp.concatenate([dec, conv5], -1))
        dec = DecoderBlock(nf * 16, nf * 4, d, name="dec4")(
            jnp.concatenate([dec, conv4], -1))
        dec = DecoderBlock(nf * 8, nf * 2, d, name="dec3")(
            jnp.concatenate([dec, conv3], -1))
        dec = DecoderBlock(nf * 4, nf, d, name="dec2")(
            jnp.concatenate([dec, conv2], -1))
        dec = ConvRelu(nf, d, name="dec1")(jnp.concatenate([dec, conv1], -1))
        out = nn.Conv(self.num_classes, (1, 1), dtype=d, name="final")(dec)
        return out.astype(jnp.float32)


class UNetVGG16(nn.Module):
    """U-Net with VGG16 encoder (reference src/unet_models.py:224-312)."""

    num_classes: int = 2
    num_filters: int = 32
    dropout_2d: float = 0.0
    is_deconv: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        d = self.dtype
        x = x.astype(d)
        conv1 = VGGStage(64, 2, (0, 2), d, name="stage1")(x)
        conv2 = VGGStage(128, 2, (5, 7), d, name="stage2")(_pool(conv1))
        conv3 = VGGStage(256, 3, (10, 12, 14), d, name="stage3")(_pool(conv2))
        conv4 = VGGStage(512, 3, (17, 19, 21), d, name="stage4")(_pool(conv3))
        conv5 = VGGStage(512, 3, (24, 26, 28), d, name="stage5")(_pool(conv4))

        dec = DecoderBlockV2(nf * 16, nf * 8, self.is_deconv, d,
                             name="center")(_pool(conv5))
        dec = DecoderBlockV2(nf * 16, nf * 8, self.is_deconv, d, name="dec5")(
            jnp.concatenate([dec, conv5], -1))
        dec = DecoderBlockV2(nf * 16, nf * 8, self.is_deconv, d, name="dec4")(
            jnp.concatenate([dec, conv4], -1))
        dec = DecoderBlockV2(nf * 8, nf * 2, self.is_deconv, d, name="dec3")(
            jnp.concatenate([dec, conv3], -1))
        dec = DecoderBlockV2(nf * 4, nf, self.is_deconv, d, name="dec2")(
            jnp.concatenate([dec, conv2], -1))
        dec = ConvRelu(nf, d, name="dec1")(jnp.concatenate([dec, conv1], -1))
        dec = SpatialDropout(self.dropout_2d, name="dropout")(
            dec, deterministic=not train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=d, name="final")(dec)
        return out.astype(jnp.float32)
