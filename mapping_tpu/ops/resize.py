"""Bilinear resize matching skimage.transform.resize(order=1) semantics.

Replaces the per-image host `resize_image` (reference:
src/postprocessing.py:48-61) with an in-graph `jax.image.resize`, which uses
the same half-pixel-center coordinate convention as skimage's warp.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("target_size",))
def resize_hw(image, target_size):
    """Resize (..., H, W) bilinearly to (..., *target_size)."""
    x = jnp.asarray(image)
    out_shape = x.shape[:-2] + tuple(target_size)
    return jax.image.resize(x, out_shape, method="linear")


def resize_chw(image, target_size):
    """Reference-compatible: (C, H, W) -> (C, target_h, target_w)."""
    return resize_hw(image, tuple(target_size))
