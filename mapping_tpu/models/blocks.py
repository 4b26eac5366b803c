"""Shared decoder building blocks for the U-Net family.

TPU-first equivalents of the TernausNet decoder pieces the reference uses
(reference: src/unet_models.py:25-52,125-150): NHWC layout so convs tile onto
the MXU, bfloat16 compute with f32 params/accumulation, and bilinear
upsampling via `jax.image.resize` in-graph.

Only the *encoders* carry pretrained weights in the reference; decoders are
always randomly initialized (src/models.py:22-47 sets `init_weights: False`
but decoder modules are fresh), so decoder blocks here match topology and
receptive field, not torch's exact transposed-conv padding arithmetic.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ConvRelu(nn.Module):
    """3x3 same-padded conv + ReLU (reference ConvRelu, src/unet_models.py:25-34)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv")(x)
        return nn.relu(x)


def upsample2x(x):
    """Bilinear 2x spatial upsample of an NHWC tensor (align_corners=False
    half-pixel convention, same as torch nn.Upsample(mode='bilinear'))."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="linear")


class DecoderBlock(nn.Module):
    """TernausNet V1 decoder block: ConvRelu -> stride-2 transposed conv -> ReLU.

    (Reference DecoderBlock, src/unet_models.py:42-53; used by UNet11.)
    """

    middle: int
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ConvRelu(self.middle, self.dtype, name="conv1")(x)
        # padding (1,2) per spatial dim is the exact equivalent of torch
        # ConvTranspose2d(k=3, s=2, padding=1, output_padding=1) — verified
        # numerically in tests/test_torch_parity.py ("SAME" splits the pad
        # differently and diverges from the reference).
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), dtype=self.dtype,
                             name="deconv")(x)
        return nn.relu(x)


class DecoderBlockV2(nn.Module):
    """TernausNet V2 decoder block (reference src/unet_models.py:125-150).

    is_deconv=True:  ConvRelu(middle) -> ConvTranspose(4x4, stride 2) -> ReLU
                     (kernel divisible by stride avoids checkerboarding).
    is_deconv=False: bilinear 2x upsample -> ConvRelu(middle) -> ConvRelu(out).
    """

    middle: int
    features: int
    is_deconv: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.is_deconv:
            x = ConvRelu(self.middle, self.dtype, name="conv1")(x)
            x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name="deconv")(x)
            return nn.relu(x)
        x = upsample2x(x)
        x = ConvRelu(self.middle, self.dtype, name="conv1")(x)
        return ConvRelu(self.features, self.dtype, name="conv2")(x)


class SpatialDropout(nn.Module):
    """Channel-wise (2D) dropout: drops whole feature maps, like
    torch F.dropout2d before the final 1x1 conv (src/unet_models.py:403)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0:
            return x
        return nn.Dropout(self.rate, broadcast_dims=(1, 2))(
            x, deterministic=deterministic
        )
