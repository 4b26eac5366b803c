"""Flax ResNet encoders (torchvision-compatible topology, NHWC layout).

The reference reuses torchvision resnet34/101/152 stages as U-Net encoder
stages conv1..conv5 (src/unet_models.py:360-371). Here the encoder is a
native Flax module that returns all five stage outputs; the layout is NHWC
and compute dtype is configurable (bfloat16 by default on TPU) so convs land
on the MXU with f32 accumulation.

Parameter naming matches torchvision module paths (conv1, bn1,
layer1_0/conv1, ...) so a converted torchvision state_dict maps one-to-one
(models/torch_convert.py). Conv+BN live in the *same* scope level as torch
(no extra submodule nesting) to keep that mapping mechanical.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def conv_bn(mdl, x, features, kernel, stride, dtype, conv_name, bn_name, train,
            fold_bn=False):
    """Conv -> BatchNorm in the caller's scope (names match torchvision).

    fold_bn=True builds the inference-only folded variant: a biased conv with
    no BatchNorm — params produced by models.fold_bn.fold_batch_stats
    (w' = w * gamma/sqrt(var+eps), b' = beta - mean*gamma/sqrt(var+eps)).
    Removes every BN elementwise pass + f32 round-trip from the forward."""
    pad = kernel // 2
    x = nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=fold_bn,
        dtype=dtype,
        name=conv_name,
        parent=mdl,
    )(x)
    if fold_bn:
        return x
    x = nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=jnp.float32,
        name=bn_name,
        parent=mdl,
    )(x)
    return x


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = conv_bn(self, x, self.features, 3, self.stride, self.dtype,
                      "conv1", "bn1", train, self.fold_bn)
        out = nn.relu(out)
        out = conv_bn(self, out, self.features, 3, 1, self.dtype,
                      "conv2", "bn2", train, self.fold_bn)
        if self.downsample:
            identity = conv_bn(self, x, self.features, 1, self.stride,
                               self.dtype, "downsample_conv", "downsample_bn",
                               train, self.fold_bn)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3 (stride here) -> 1x1 x4."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = conv_bn(self, x, self.features, 1, 1, self.dtype,
                      "conv1", "bn1", train, self.fold_bn)
        out = nn.relu(out)
        out = conv_bn(self, out, self.features, 3, self.stride, self.dtype,
                      "conv2", "bn2", train, self.fold_bn)
        out = nn.relu(out)
        out = conv_bn(self, out, self.features * 4, 1, 1, self.dtype,
                      "conv3", "bn3", train, self.fold_bn)
        if self.downsample:
            identity = conv_bn(self, x, self.features * 4, 1, self.stride,
                               self.dtype, "downsample_conv", "downsample_bn",
                               train, self.fold_bn)
        return nn.relu(out + identity)


_CONFIGS = {
    34: (BasicBlock, (3, 4, 6, 3), 512),
    101: (Bottleneck, (3, 4, 23, 3), 2048),
    152: (Bottleneck, (3, 8, 36, 3), 2048),
}


class ResNetEncoder(nn.Module):
    """Returns the five stage outputs used as U-Net skips.

    Stage spatial scales for input H: conv1 H/4 (after maxpool, matching the
    reference's conv1 = stem + extra pool at src/unet_models.py:360-363),
    layer1 H/4, layer2 H/8, layer3 H/16, layer4 H/32.
    """

    depth: int = 34
    dtype: Dtype = jnp.bfloat16
    fold_bn: bool = False

    @property
    def bottom_channels(self):
        return _CONFIGS[self.depth][2]

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, layers, _ = _CONFIGS[self.depth]
        x = conv_bn(self, x, 64, 7, 2, self.dtype, "conv1", "bn1", train,
                    self.fold_bn)
        x = nn.relu(x)
        # The reference's UNet stem swaps torchvision's 3x3 maxpool for a
        # plain 2x2/2 pool (src/unet_models.py:356-363); same H/4 output.
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        stem = x  # H/4

        feats = []
        features = 64
        for stage, n_blocks in enumerate(layers):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                expansion = 4 if block_cls is Bottleneck else 1
                needs_down = b == 0 and (stride != 1 or x.shape[-1] != features * expansion)
                x = block_cls(
                    features,
                    stride if b == 0 else 1,
                    downsample=needs_down,
                    dtype=self.dtype,
                    fold_bn=self.fold_bn,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            feats.append(x)
            features *= 2
        # conv1 in the reference includes the maxpool, so its output is the
        # stem; layer1 operates at the same scale.
        return [stem] + feats
