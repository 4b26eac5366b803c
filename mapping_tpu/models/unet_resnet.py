"""U-Net with ResNet encoder — the production model family.

TPU-native rebuild of the reference's UNetResNet / AlbuNet
(src/unet_models.py:315-403, 153-221): NHWC, bfloat16 MXU compute, bilinear
or transposed-conv upsampling, spatial dropout before the final 1x1.

Input spatial dims must be divisible by 64 (five stride-2 encoder stages plus
the pre-center pool). Returns logits (N, H, W, num_classes) in float32.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mapping_tpu.models.blocks import ConvRelu, DecoderBlockV2, SpatialDropout
from mapping_tpu.models.resnet import ResNetEncoder

Dtype = Any


class UNetResNet(nn.Module):
    """Reference UNetResNet (src/unet_models.py:315-403).

    Decoder wiring: center on pooled conv5; skip-concats on dec5..dec2;
    dec1/dec0 unskipped; 1x1 final after spatial dropout.
    """

    encoder_depth: int = 34
    num_classes: int = 2
    num_filters: int = 32
    dropout_2d: float = 0.0
    is_deconv: bool = True
    dtype: Dtype = jnp.bfloat16
    fold_bn: bool = False  # inference-only: BN folded into conv weights

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        x = x.astype(self.dtype)
        conv1, conv2, conv3, conv4, conv5 = ResNetEncoder(
            self.encoder_depth, self.dtype, fold_bn=self.fold_bn,
            name="encoder"
        )(x, train)

        pool = nn.max_pool(conv5, (2, 2), strides=(2, 2))
        dec = DecoderBlockV2(nf * 16, nf * 8, self.is_deconv, self.dtype,
                             name="center")(pool)
        dec = DecoderBlockV2(nf * 16, nf * 8, self.is_deconv, self.dtype,
                             name="dec5")(jnp.concatenate([dec, conv5], -1))
        dec = DecoderBlockV2(nf * 16, nf * 8, self.is_deconv, self.dtype,
                             name="dec4")(jnp.concatenate([dec, conv4], -1))
        dec = DecoderBlockV2(nf * 8, nf * 2, self.is_deconv, self.dtype,
                             name="dec3")(jnp.concatenate([dec, conv3], -1))
        dec = DecoderBlockV2(nf * 4, nf * 4, self.is_deconv, self.dtype,
                             name="dec2")(jnp.concatenate([dec, conv2], -1))
        dec = DecoderBlockV2(nf * 4, nf, self.is_deconv, self.dtype,
                             name="dec1")(dec)
        dec = ConvRelu(nf, self.dtype, name="dec0")(dec)
        dec = SpatialDropout(self.dropout_2d, name="dropout")(
            dec, deterministic=not train
        )
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="final")(dec)
        return out.astype(jnp.float32)


class AlbuNet(nn.Module):
    """ResNet34 U-Net variant (reference AlbuNet, src/unet_models.py:153-221).

    Topologically UNetResNet(34) without the pre-final dropout.
    """

    num_classes: int = 2
    num_filters: int = 32
    is_deconv: bool = True
    dtype: Dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        return UNetResNet(
            encoder_depth=34,
            num_classes=self.num_classes,
            num_filters=self.num_filters,
            dropout_2d=0.0,
            is_deconv=self.is_deconv,
            dtype=self.dtype,
            fold_bn=self.fold_bn,
            name="unet",
        )(x, train)
