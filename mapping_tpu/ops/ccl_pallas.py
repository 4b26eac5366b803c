"""Pallas TPU kernel: connected-component label propagation in VMEM.

The jnp implementation (ops/ccl.py) runs each propagation sweep as separate
XLA ops, so every iteration round-trips the (B, L, H, W) label tensor through
HBM several times (4 associative scans per sweep). This kernel instead loads
one (H, W) image into VMEM and runs ALL sweeps to convergence there — the
label array never leaves the chip's vector memory until it is final. The
segmented min-scans are Hillis-Steele log-step sweeps (static Python loop of
shift+min steps on the full VMEM-resident tile, pure VPU work).

Semantics identical to ops.ccl._label_raw: 4-connectivity, labels = linear
index of the component's minimal pixel + 1, background 0. Renumbering to
consecutive 1..N stays in ops.ccl (cumsum + gather, cheap).

Mosaic notes: segment flags are carried as int32, not bool — concatenating
i1 vectors hits an unimplemented vreg bitcast; `rev` has no lowering either,
so the backward scan mirrors the forward one with left shifts.

Grid: one program per image-layer; each program owns the full (H, W) block.
VMEM budget: labels + mask + scan temporaries ≈ 6 * H*W * 4B — ~2.2 MB for
304x304, comfortably inside the ~16 MB/core budget.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = jnp.iinfo(jnp.int32).max


def _shift_right(x, d, axis, fill):
    """Shift int32 x by +d along axis, filling vacated slots with `fill`."""
    h, w = x.shape
    if axis == 1:
        pad = jnp.full((h, d), fill, x.dtype)
        return jnp.concatenate([pad, x[:, : w - d]], axis=1)
    pad = jnp.full((d, w), fill, x.dtype)
    return jnp.concatenate([pad, x[: h - d, :]], axis=0)


def _shift_left(x, d, axis, fill):
    """Shift int32 x by -d along axis, filling vacated slots with `fill`."""
    h, w = x.shape
    if axis == 1:
        pad = jnp.full((h, d), fill, x.dtype)
        return jnp.concatenate([x[:, d:], pad], axis=1)
    pad = jnp.full((d, w), fill, x.dtype)
    return jnp.concatenate([x[d:, :], pad], axis=0)


def _seg_min_inclusive(values, starts_i32, axis):
    """Forward inclusive segmented min (Hillis-Steele, log2(size) steps).

    starts_i32: int32 0/1, 1 at each segment's first element. Elements never
    read past a flag: v_i <- v_i if f_i else min(v_i, v_{i-d});
    f_i <- max(f_i, f_{i-d}).
    """
    size = values.shape[axis]
    v, f = values, starts_i32
    d = 1
    while d < size:
        pv = _shift_right(v, d, axis, _INF)
        pf = _shift_right(f, d, axis, 1)
        v = jnp.where(f > 0, v, jnp.minimum(v, pv))
        f = jnp.maximum(f, pf)
        d *= 2
    return v


def _seg_min_backward(values, ends_i32, axis):
    """Backward inclusive segmented min (mirror with left shifts)."""
    size = values.shape[axis]
    v, e = values, ends_i32
    d = 1
    while d < size:
        pv = _shift_left(v, d, axis, _INF)
        pe = _shift_left(e, d, axis, 1)
        v = jnp.where(e > 0, v, jnp.minimum(v, pv))
        e = jnp.maximum(e, pe)
        d *= 2
    return v


def _seg_min_both(values, starts_i32, axis):
    """Min over each element's full segment: forward + backward sweeps."""
    fwd = _seg_min_inclusive(values, starts_i32, axis)
    # a segment's end boundary is the next element's start
    ends = _shift_left(starts_i32, 1, axis, 1)
    bwd = _seg_min_backward(values, ends, axis)
    return jnp.minimum(fwd, bwd)


def _propagate_to_convergence(init, fg, row_starts, col_starts, max_iters):
    """Alternating row/col segmented-min sweeps until no label changes.

    Returns (labels, iteration count). One row+col round per convergence
    check (a second round per check overflows the 16 MB scoped-VMEM budget
    at 304x304)."""

    def body(state):
        labels, _, it = state
        new = jnp.where(fg, _seg_min_both(labels, row_starts, 1), _INF)
        new = jnp.where(fg, _seg_min_both(new, col_starts, 0), _INF)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    labels, _, iters = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return labels, iters


def _run_starts(mask_i):
    """Row/col run-start flags: foreground pixel whose left/up neighbor is
    background."""
    row_starts = mask_i * (1 - _shift_right(mask_i, 1, 1, 0))
    col_starts = mask_i * (1 - _shift_right(mask_i, 1, 0, 0))
    return row_starts, col_starts


def _ccl_kernel(mask_ref, labels_ref, *, max_iters):
    mask_i = mask_ref[0]  # int32 0/1
    fg = mask_i > 0
    h, w = mask_i.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lin = row_ids * w + col_ids
    init = jnp.where(fg, lin + 1, _INF)
    row_starts, col_starts = _run_starts(mask_i)
    labels, _ = _propagate_to_convergence(init, fg, row_starts, col_starts,
                                          max_iters)
    labels_ref[0] = jnp.where(fg, labels, 0)


def _ccl_renumber_kernel(mask_ref, labels_ref, *, max_iters):
    """CCL + consecutive 1..N renumbering fused in one VMEM-resident program.

    The host-side renumber (ops.ccl._renumber: cumsum + per-pixel gather) was
    the postprocess hot spot — take_along_axis lowers to a serialized gather
    on TPU (~1 ms/image at 300²). Here the rank map is computed in VMEM with
    two Hillis-Steele cumsums and then *propagated* to the component exactly
    like the labels were: after k sweeps the root's value reaches precisely
    the pixels its min-label reached in the first loop, so re-running the
    same sweep count delivers every pixel its component's rank. No gather.
    """
    mask_i = mask_ref[0]
    fg = mask_i > 0
    h, w = mask_i.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lin = row_ids * w + col_ids
    init = jnp.where(fg, lin + 1, _INF)
    row_starts, col_starts = _run_starts(mask_i)
    labels, iters = _propagate_to_convergence(init, fg, row_starts, col_starts,
                                              max_iters)

    # rank = row-major inclusive cumsum of is_root (scipy's component order:
    # by first pixel in row-major scan = by minimal linear index)
    is_root = jnp.where(fg & (labels == lin + 1), 1, 0).astype(jnp.int32)
    c = is_root
    d = 1
    while d < w:  # within-row inclusive cumsum
        c = c + _shift_right(c, d, 1, 0)
        d *= 2
    row_tot = jnp.broadcast_to(jnp.sum(is_root, axis=1, keepdims=True), (h, w))
    ex = _shift_right(row_tot, 1, 0, 0)  # exclusive cumsum of row totals
    d = 1
    while d < h:
        ex = ex + _shift_right(ex, d, 0, 0)
        d *= 2
    rank = c + ex

    # spread each root's rank over its component with the same sweep count
    init2 = jnp.where(is_root > 0, rank, _INF)

    def body2(state):
        labs, it = state
        new = jnp.where(fg, _seg_min_both(labs, row_starts, 1), _INF)
        new = jnp.where(fg, _seg_min_both(new, col_starts, 0), _INF)
        return new, it + 1

    def cond2(state):
        return state[1] < iters

    labs2, _ = jax.lax.while_loop(cond2, body2, (init2, jnp.int32(0)))
    labels_ref[0] = jnp.where(fg, labs2, 0)


def _pallas_label_call(kernel_fn, mask, max_iters, interpret):
    mask = jnp.asarray(mask)
    n, h, w = mask.shape
    if max_iters is None:
        max_iters = h + w
    kernel = partial(kernel_fn, max_iters=max_iters)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        interpret=interpret,
    )(mask.astype(jnp.int32))


@partial(jax.jit, static_argnames=("max_iters", "interpret"))
def label_raw_pallas(mask, max_iters=None, interpret=False):
    """(N, H, W) bool -> (N, H, W) int32 root-index labels, one pallas
    program per image; drop-in for ops.ccl._label_raw on stacked input."""
    return _pallas_label_call(_ccl_kernel, mask, max_iters, interpret)


@partial(jax.jit, static_argnames=("max_iters", "interpret"))
def label_pallas(mask, max_iters=None, interpret=False):
    """(N, H, W) bool -> consecutive 1..N labels (scipy.ndimage.label
    ordering), renumbering fused into the kernel — no host-side gather."""
    return _pallas_label_call(_ccl_renumber_kernel, mask, max_iters, interpret)
