"""Connected-component labeling on device (4-connectivity).

Replaces the reference's per-image host loop over `scipy.ndimage.label`
(reference: src/utils.py:328-330, called from src/postprocessing.py:127-132).

Algorithm: label-propagation with row/column segmented min-scans.
Each foreground pixel starts with its linear index + 1. One iteration
propagates the minimum label across every horizontal run and every vertical
run of foreground pixels (a segmented min computed with
`jax.lax.associative_scan`). Alternating row/column sweeps converge in
O(#spiral windings) iterations — a handful for real building footprints —
inside a `lax.while_loop`, so the whole batch labels in one XLA program with
static shapes. Final labels are renumbered to consecutive 1..N per image with
a sort/rank pass (no host round-trip).

scipy.ndimage.label (cross structuring element) is the oracle in tests.
"""

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.iinfo(jnp.int32).max


def _segmented_min_scan(values, starts, axis):
    """Min within each segment (segments delimited by `starts` flags) along axis.

    Combine op for (flag, value): a segment-start flag resets the running min.
    Forward + backward pass gives every element the min of its full segment.
    """

    def combine(a, b):
        a_flag, a_val = a
        b_flag, b_val = b
        flag = jnp.logical_or(a_flag, b_flag)
        val = jnp.where(b_flag, b_val, jnp.minimum(a_val, b_val))
        return flag, val

    _, fwd = jax.lax.associative_scan(combine, (starts, values), axis=axis)
    # Backward: a segment's *end* boundary is the next element's start.
    rev_starts = jnp.flip(jnp.roll(starts, -1, axis=axis), axis=axis)
    # roll wraps the first flag to the end; the flipped array's first element
    # must be treated as a start anyway, which the scan's identity handles
    # since the first combine uses it as-is.
    _, bwd = jax.lax.associative_scan(
        combine, (rev_starts, jnp.flip(values, axis=axis)), axis=axis
    )
    bwd = jnp.flip(bwd, axis=axis)
    return jnp.minimum(fwd, bwd)


def _propagate_rows(labels, mask):
    starts = jnp.logical_and(
        mask, jnp.logical_not(jnp.roll(mask, 1, axis=-1)).at[..., 0].set(True)
    )
    scanned = _segmented_min_scan(labels, starts, axis=-1)
    return jnp.where(mask, scanned, _INF)


def _propagate_cols(labels, mask):
    starts = jnp.logical_and(
        mask, jnp.logical_not(jnp.roll(mask, 1, axis=-2)).at[..., 0, :].set(True)
    )
    scanned = _segmented_min_scan(labels, starts, axis=-2)
    return jnp.where(mask, scanned, _INF)


@partial(jax.jit, static_argnames=("max_iters",))
def _label_raw(mask, max_iters):
    """mask: (..., H, W) bool -> labels (..., H, W) int32, root-pixel indices.

    Background is 0; foreground labels are arbitrary distinct ints (the linear
    index of the component's minimal pixel, +1).
    """
    shape = mask.shape
    h, w = shape[-2], shape[-1]
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape((1,) * (len(shape) - 2) + (h, w))
    labels = jnp.where(mask, lin + 1, _INF)

    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = _propagate_rows(labels, mask)
        new = _propagate_cols(new, mask)
        changed = jnp.any(new != labels)
        return new, changed, it + jnp.int32(1)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(mask, labels, 0)


@jax.jit
def _renumber(labels):
    """Map root-index labels to consecutive 1..N per image (0 stays 0).

    labels: (..., H, W) int32 where each foreground label is the linear index
    of its component's minimal pixel + 1 (the `_label_raw` invariant). A
    pixel is its component's *root* iff its own linear index + 1 equals its
    label; ranking roots by a row-major prefix sum and gathering the rank at
    each pixel's root reproduces scipy.ndimage.label's numbering
    (components ordered by first pixel in row-major scan) with one cumsum +
    one gather — no sort needed.
    """
    shape = labels.shape
    h, w = shape[-2], shape[-1]
    flat = labels.reshape(shape[:-2] + (h * w,))
    lin = jnp.arange(1, h * w + 1, dtype=jnp.int32)
    is_root = flat == lin
    ranks = jnp.cumsum(is_root.astype(jnp.int32), axis=-1)
    root_idx = jnp.maximum(flat - 1, 0)
    out = jnp.where(flat > 0,
                    jnp.take_along_axis(ranks, root_idx, axis=-1), 0)
    return out.reshape(shape).astype(jnp.int32)


def connected_components(mask, max_iters=None, renumber=True, backend="auto"):
    """Label 4-connected components of a binary mask batch on device.

    Args:
        mask: (..., H, W) bool / int array; nonzero = foreground.
        max_iters: cap on propagation sweeps (default H + W, always enough).
        renumber: if True, labels are consecutive 1..N per image, matching
            scipy.ndimage.label ordering (components numbered by their
            first pixel in row-major order — which equals ordering by
            minimal linear index, the same invariant our roots provide).
        backend: 'auto' picks the Pallas whole-image-in-VMEM kernel on TPU
            (ops/ccl_pallas.py, ~2x the XLA-scan path) and the jnp
            implementation elsewhere; 'jnp' / 'pallas' force one.

    Returns:
        int32 labels, same shape as mask.
    """
    mask = jnp.asarray(mask)
    mask_b = mask != 0
    h, w = mask.shape[-2], mask.shape[-1]
    if max_iters is None:
        max_iters = h + w
    if backend == "auto":
        backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "jnp"
    if backend == "pallas":
        flat = mask_b.reshape((-1, h, w))
        if renumber:
            # fused renumbering: the cumsum+gather _renumber costs ~1 ms/img
            # on TPU (serialized gather); the kernel spreads root ranks with
            # the same VMEM sweeps instead (ops/ccl_pallas.py)
            from mapping_tpu.ops.ccl_pallas import label_pallas

            return label_pallas(flat, max_iters).reshape(mask.shape)
        from mapping_tpu.ops.ccl_pallas import label_raw_pallas

        labels = label_raw_pallas(flat, max_iters).reshape(mask.shape)
    else:
        labels = _label_raw(mask_b, max_iters)
    if renumber:
        labels = _renumber(labels)
    return labels


def num_components(labels):
    """Number of components per image from renumbered labels: (...,) int32."""
    return jnp.max(labels, axis=(-2, -1))
