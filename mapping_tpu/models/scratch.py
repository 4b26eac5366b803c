"""Parametric from-scratch U-Net (+ multitask variant).

Parity target: the reference's configurable classic U-Net
(src/steps/pytorch/architectures/unet.py:7-326) with knobs for filter count,
depth (repeat_blocks), pool kernel/stride, batch norm and dropout, plus a
multi-head variant (UNetMultitask, :181-229). NHWC / bfloat16 compute.

The pool stride must evenly divide the spatial dims at every level for static
shapes (the reference relied on torch's implicit padding arithmetic; here
`pool_stride**repeat_blocks | H` is asserted up front).
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class _ConvBlock(nn.Module):
    """Two conv(+BN)+ReLU layers, optional dropout at a configurable spot."""

    features: int
    kernel: int
    batch_norm: bool
    dropout: float
    dropout_last: bool = True  # reference DownConv has dropout after, UpConv too
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(2):
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        padding="SAME", dtype=self.dtype, name=f"conv{i}")(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name=f"bn{i}")(x)
            x = nn.relu(x)
        if self.dropout > 0 and self.dropout_last:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class UNet(nn.Module):
    """Configurable classic U-Net (reference UNet, architectures/unet.py:7-178).

    Structure: input block (n_filters) -> repeat_blocks x [DownConv(x2 ch),
    pool] -> floor DownConv -> repeat_blocks x [upsample, skip-concat,
    UpConv(/2 ch)] -> classification block -> 1x1 output.
    """

    conv_kernel: int = 3
    pool_kernel: int = 3
    pool_stride: int = 2
    repeat_blocks: int = 2
    n_filters: int = 8
    batch_norm: bool = True
    dropout: float = 0.1
    in_channels: int = 3
    out_channels: int = 2
    nr_outputs: int = 1
    dtype: Dtype = jnp.bfloat16

    def _backbone(self, x, train):
        d = self.dtype
        nf = self.n_filters
        x = _ConvBlock(nf, self.conv_kernel, self.batch_norm, self.dropout,
                       dtype=d, name="input_block")(x, train)
        skips = []
        pk, ps = self.pool_kernel, self.pool_stride
        pad = (pk - ps + 1) // 2 if pk > ps else 0
        for i in range(self.repeat_blocks):
            x = _ConvBlock(nf * 2 ** (i + 1), self.conv_kernel,
                           self.batch_norm, self.dropout, dtype=d,
                           name=f"down{i}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, (pk, pk), strides=(ps, ps),
                            padding=[(pad, pad), (pad, pad)])
        x = _ConvBlock(nf * 2 ** (self.repeat_blocks + 1), self.conv_kernel,
                       self.batch_norm, self.dropout, dtype=d,
                       name="floor")(x, train)
        for i in reversed(range(self.repeat_blocks)):
            up_features = nf * 2 ** (i + 1)
            x = nn.ConvTranspose(up_features, (ps * 3, ps * 3),
                                 strides=(ps, ps), padding="SAME",
                                 use_bias=False, dtype=d,
                                 name=f"up_sample{i}")(x)
            x = jnp.concatenate([skips[i], x], axis=-1)
            x = _ConvBlock(up_features, self.conv_kernel, self.batch_norm,
                           self.dropout, dtype=d, name=f"up{i}")(x, train)
        x = _ConvBlock(nf, self.conv_kernel, self.batch_norm, self.dropout,
                       dropout_last=False, dtype=d,
                       name="classification_block")(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self._backbone(x.astype(self.dtype), train)
        out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                      name="output")(x)
        return out.astype(jnp.float32)


class UNetMultitask(UNet):
    """N independent 1x1 output heads on a shared backbone
    (reference UNetMultitask, architectures/unet.py:181-229)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self._backbone(x.astype(self.dtype), train)
        outs = []
        for i in range(self.nr_outputs):
            out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                          name=f"output_leg{i}")(x)
            outs.append(out.astype(jnp.float32))
        return outs
