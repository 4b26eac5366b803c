"""Exact Euclidean distance transform on device.

Replaces scipy.ndimage.distance_transform_edt in mask preparation
(reference: src/preparation.py:151-167 — per-object EDT of the complement,
keep the two smallest distances per pixel, sum them).

Two-phase separable algorithm:
  1. per-row 1-D distance to the nearest seed column via forward/backward
     running-min of seed coordinates (a plain cummin — associative, fast);
  2. exact 2-D squared distance D^2(y, x) = min_y' (g(y', x)^2 + (y - y')^2),
     a min-plus reduction over the row axis evaluated in y-chunks so the
     (chunk, H, W) intermediate stays small.

This matches Felzenszwalb's exact EDT output (phase 2 is the brute-force
min-plus evaluation of the same envelope, trivially parallel on the VPU).
"""

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e12)


def _row_distance(seeds):
    """seeds: (..., H, W) bool. Distance along each row to nearest seed."""
    w = seeds.shape[-1]
    col = jnp.arange(w, dtype=jnp.float32)
    x_where = jnp.where(seeds, col, _BIG)
    # nearest seed to the left = max coord in prefix -> cummax; to the right =
    # min coord in suffix -> reversed cummin.
    left = jax.lax.associative_scan(jnp.maximum, jnp.where(seeds, col, -_BIG), axis=-1)
    right = jnp.flip(
        jax.lax.associative_scan(jnp.minimum, jnp.flip(x_where, axis=-1), axis=-1),
        axis=-1,
    )
    d_left = col - left
    d_right = right - col
    return jnp.minimum(d_left, d_right)


@partial(jax.jit, static_argnames=("chunk",))
def edt(mask, chunk=16):
    """Euclidean distance from each pixel to the nearest nonzero of `mask`.

    Equivalent to scipy.ndimage.distance_transform_edt(1 - mask) in the
    reference's usage (distance to the object, zero inside it).

    Args:
        mask: (..., H, W) bool/int; nonzero pixels are the seed set.
        chunk: rows of output computed per min-plus block.

    Returns:
        float32 distances, same shape.
    """
    seeds = jnp.asarray(mask) != 0
    g = _row_distance(seeds)  # (..., H, W) row-wise distance (may be _BIG)
    g2 = jnp.minimum(g * g, _BIG)  # squared, clipped to avoid inf arithmetic

    h = seeds.shape[-2]
    ys = jnp.arange(h, dtype=jnp.float32)

    def block(y0):
        # distances for output rows [y0, y0+chunk)
        y_out = y0 + jnp.arange(chunk, dtype=jnp.float32)  # (chunk,)
        dy2 = (y_out[:, None] - ys[None, :]) ** 2  # (chunk, H)
        # g2: (..., H, W) -> broadcast (..., chunk, H, W) is too big; reduce
        # over H with einsum-style min: min_y' (g2[..., y', x] + dy2[c, y'])
        vals = g2[..., None, :, :] + dy2[..., :, :, None]  # (..., chunk, H, W)
        return jnp.min(vals, axis=-2)  # (..., chunk, W)

    n_blocks = -(-h // chunk)
    y0s = jnp.arange(n_blocks) * chunk
    out = jax.lax.map(block, y0s)  # (n_blocks, ..., chunk, W)
    # move block axis next to chunk axis and merge
    out = jnp.moveaxis(out, 0, -3)  # (..., n_blocks, chunk, W)
    out = out.reshape(seeds.shape[:-2] + (n_blocks * chunk, seeds.shape[-1]))
    out = out[..., :h, :]
    return jnp.sqrt(out)


@jax.jit
def distance_stack_top2(distances, valid):
    """Reference `clean_distances` on an object-distance stack.

    Args:
        distances: (N, H, W) float — EDT per object (padded slots arbitrary).
        valid: (N,) bool — which object slots are real.

    Returns:
        (dist_sum, second_nearest): per-pixel sum of the two smallest
        distances and the second-smallest itself, matching
        src/preparation.py:159-167 (with <2 objects the single/zero map is
        duplicated).
    """
    n = distances.shape[0]
    big = jnp.float32(1e12)
    d = jnp.where(valid[:, None, None], distances, big)
    neg_top2, _ = jax.lax.top_k(jnp.moveaxis(-d, 0, -1), 2)  # (H, W, 2)
    top2 = -neg_top2
    nearest = top2[..., 0]
    second = top2[..., 1]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # 0 objects: reference distances stay all-zero; 1 object: duplicate it.
    nearest = jnp.where(n_valid >= 1, nearest, 0.0)
    second = jnp.where(n_valid >= 2, second, nearest)
    return nearest + second, second
