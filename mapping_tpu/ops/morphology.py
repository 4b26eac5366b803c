"""Grayscale/binary morphology via `lax.reduce_window`.

Replaces skimage.morphology erosion/dilation with rectangular structuring
elements (reference: src/postprocessing.py:135-180, src/preparation.py:170-186).

skimage's `rectangle(k, k)` erosion/dilation is a k x k min/max filter whose
origin is the element center; for even k skimage uses center index k//2
(i.e. one more neighbor before than after on each axis).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _window_pad(k):
    # skimage centers even-sized footprints at index k//2: pad (k//2) before,
    # (k - 1 - k//2) after.
    before = k // 2
    after = k - 1 - before
    return before, after


@partial(jax.jit, static_argnames=("size",))
def erode(image, size):
    """Min-filter with a size x size rectangle over the last two axes."""
    if size <= 0:
        return image
    lo, hi = _window_pad(size)
    x = jnp.asarray(image)
    pad = [(0, 0)] * (x.ndim - 2) + [(lo, hi), (lo, hi)]
    init = jnp.asarray(jnp.iinfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.integer) else jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.min,
        window_dimensions=(1,) * (x.ndim - 2) + (size, size),
        window_strides=(1,) * x.ndim,
        padding=pad,
    )


@partial(jax.jit, static_argnames=("size",))
def dilate(image, size):
    """Max-filter with a size x size rectangle over the last two axes."""
    if size <= 0:
        return image
    lo, hi = _window_pad(size)
    x = jnp.asarray(image)
    # Mirror the erosion origin: dilation with an even footprint reflects it,
    # so pad (hi, lo).
    pad = [(0, 0)] * (x.ndim - 2) + [(hi, lo), (hi, lo)]
    init = jnp.asarray(jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf, x.dtype)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (size, size),
        window_strides=(1,) * x.ndim,
        padding=pad,
    )
