"""UNet++ (nested U-Net) — beyond-parity model family.

Zhou et al., "UNet++: A Nested U-Net Architecture for Medical Image
Segmentation" (arXiv:1807.10165, retrieved in PAPERS.md): dense skip
pathways X[i][j] = H(concat(X[i][0..j-1], up(X[i+1][j-1]))) close the
semantic gap between encoder and decoder features; optional deep supervision
averages the per-depth 1x1 heads.

NHWC / bf16 like the rest of the zoo; input spatial dims must be divisible
by 2^(depth-1).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _ConvBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


def _up2x(x):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), "linear")


class UNetPlusPlus(nn.Module):
    num_classes: int = 2
    n_filters: int = 32
    depth: int = 5
    deep_supervision: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        feats = [self.n_filters * 2**i for i in range(self.depth)]

        # grid of nodes: grid[i][j] = X^{i,j}
        grid = [[None] * self.depth for _ in range(self.depth)]
        for i in range(self.depth):
            inp = x if i == 0 else nn.max_pool(grid[i - 1][0], (2, 2),
                                               strides=(2, 2))
            grid[i][0] = _ConvBlock(feats[i], d, name=f"x{i}_0")(inp, train)
        for j in range(1, self.depth):
            for i in range(self.depth - j):
                skips = [grid[i][k] for k in range(j)]
                up = _up2x(grid[i + 1][j - 1])
                cat = jnp.concatenate(skips + [up], axis=-1)
                grid[i][j] = _ConvBlock(feats[i], d, name=f"x{i}_{j}")(cat,
                                                                       train)

        if self.deep_supervision:
            heads = [
                nn.Conv(self.num_classes, (1, 1), dtype=d,
                        name=f"head_{j}")(grid[0][j])
                for j in range(1, self.depth)
            ]
            out = sum(heads) / len(heads)
        else:
            out = nn.Conv(self.num_classes, (1, 1), dtype=d,
                          name="final")(grid[0][self.depth - 1])
        return out.astype(jnp.float32)
