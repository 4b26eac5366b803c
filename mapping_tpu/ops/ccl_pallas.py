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


def _ccl_kernel(mask_ref, labels_ref, *, max_iters):
    mask_i = mask_ref[0]  # int32 0/1
    fg = mask_i > 0
    h, w = mask_i.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lin = row_ids * w + col_ids
    init = jnp.where(fg, lin + 1, _INF)

    # run starts: foreground pixel whose left/up neighbor is background
    row_starts = mask_i * (1 - _shift_right(mask_i, 1, 1, 0))
    col_starts = mask_i * (1 - _shift_right(mask_i, 1, 0, 0))

    def body(state):
        # one row+col round per convergence check (a second round per check
        # overflows the 16 MB scoped-VMEM budget at 304x304)
        labels, _, it = state
        new = jnp.where(fg, _seg_min_both(labels, row_starts, 1), _INF)
        new = jnp.where(fg, _seg_min_both(new, col_starts, 0), _INF)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    labels_ref[0] = jnp.where(fg, labels, 0)


@partial(jax.jit, static_argnames=("max_iters", "interpret"))
def label_raw_pallas(mask, max_iters=None, interpret=False):
    """(N, H, W) bool -> (N, H, W) int32 root-index labels, one pallas
    program per image; drop-in for ops.ccl._label_raw on stacked input."""
    mask = jnp.asarray(mask)
    n, h, w = mask.shape
    if max_iters is None:
        max_iters = h + w
    kernel = partial(_ccl_kernel, max_iters=max_iters)
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
