"""Per-instance reductions over labeled masks, via segment_sum.

Replaces the reference's per-label host loops (`build_score`
src/postprocessing.py:228-236, `get_size_matrix` src/preparation.py:189-195)
with fixed-size on-device scatter-adds: all instances of an image reduce in
one pass regardless of count, padded to `max_instances`.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_instances",))
def instance_areas(labels, max_instances):
    """labels: (H, W) int32 in 0..N. Returns (max_instances+1,) pixel counts
    (index 0 = background)."""
    flat = labels.reshape(-1)
    return jax.ops.segment_sum(
        jnp.ones_like(flat, dtype=jnp.int32), flat, num_segments=max_instances + 1
    )


@partial(jax.jit, static_argnames=("max_instances",))
def instance_prob_sums(labels, probabilities, max_instances):
    """Sum of probability over each instance. labels (H, W), probs (H, W)."""
    flat = labels.reshape(-1)
    return jax.ops.segment_sum(
        probabilities.reshape(-1).astype(jnp.float32),
        flat,
        num_segments=max_instances + 1,
    )


def _bf16_split(x):
    """(hi, lo) bf16 pair with hi + lo = x to ~2^-16 relative.

    Implemented with lax.reduce_precision: a bare f32->bf16->f32 convert pair
    is folded away by XLA's algebraic simplifier under jit, which silently
    turns the split into plain bf16 (lo becomes exactly 0). reduce_precision
    rounds in-dtype and cannot be folded; the subsequent bf16 cast of hi is
    exact."""
    hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    lo = x - hi_f32
    return hi_f32.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("max_instances", "pixel_chunk"))
def instance_areas_and_prob_sums(labels, probabilities, max_instances,
                                 pixel_chunk=2048):
    """Batched per-instance pixel counts and probability sums WITHOUT scatter.

    labels (M, H, W) int32 in 0..N, probabilities (M, H, W) float ->
    (areas (M, max_instances+1) int32, sums (M, max_instances+1) float32).

    jax.ops.segment_sum lowers to a serialized scatter on TPU (~25 ms for
    32 images at 300²); this instead builds a one-hot over instance ids per
    pixel chunk and reduces with a batched matmul on the MXU (~0.5 ms).
    The one-hot is bf16 (exact 0/1) and probabilities ride as a bf16 hi+lo
    split, so areas are exact and prob sums keep ~7 significant digits.
    """
    m = labels.shape[0]
    p = labels.shape[-2] * labels.shape[-1]
    n = max_instances + 1
    flat_l = labels.reshape(m, p)
    flat_p = probabilities.reshape(m, p).astype(jnp.float32)
    iota = jnp.arange(n, dtype=jnp.int32)
    hi, lo = _bf16_split(flat_p)
    vals = jnp.stack([jnp.ones_like(hi), hi, lo], axis=1)  # (M, 3, P)

    # pad to a chunk multiple with background pixels (label 0, zero values):
    # they only touch the background column, which every caller drops
    pc = min(pixel_chunk, p)
    pad = -p % pc
    if pad:
        flat_l = jnp.pad(flat_l, ((0, 0), (0, pad)))
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, pad)))

    def step(carry, idx):
        lc = jax.lax.dynamic_slice_in_dim(flat_l, idx, pc, axis=1)
        vc = jax.lax.dynamic_slice_in_dim(vals, idx, pc, axis=2)
        onehot = (lc[:, :, None] == iota).astype(jnp.bfloat16)  # (M, pc, N)
        return carry + jnp.einsum("bvp,bpn->bvn", vc, onehot,
                                  preferred_element_type=jnp.float32), None

    n_chunks = (p + pad) // pc
    acc, _ = jax.lax.scan(step, jnp.zeros((m, 3, n), jnp.float32),
                          jnp.arange(n_chunks, dtype=jnp.int32) * pc)
    areas = acc[:, 0].astype(jnp.int32)
    sums = acc[:, 1] + acc[:, 2]
    return areas, sums


#: column order of instance_feature_tensor (threshold + GT iou are appended
#: host-side; reference feature list: src/postprocessing.py:286-303)
FEATURE_COLUMNS = ("area", "mean_prob", "max_prob", "bbox_ar", "bbox_area",
                   "bbox_fill", "min_dist_to_border", "max_dist_to_border",
                   "contour_length")


@partial(jax.jit, static_argnames=("max_instances", "pixel_chunk"))
def instance_feature_tensor(labels, probabilities, max_instances,
                            pixel_chunk=2048):
    """All per-instance scoring features in one device pass — replaces the
    reference's per-instance host loop (get_features_for_mask,
    src/postprocessing.py:286-303) and round-1's Python bbox/contour loops.

    labels (M, H, W) int32 in 0..N, probabilities (M, H, W) float ->
    (M, max_instances, 9) float32 ordered as FEATURE_COLUMNS. Padding slots
    (area 0) are all-zero rows.

    Same dense chunked one-hot strategy as instance_areas_and_prob_sums: the
    prob sums ride a bf16 hi/lo matmul on the MXU; max/bbox reductions fuse
    the one-hot compare into VPU reduces. Contour length = area - interior
    count, where a pixel is interior iff all 4 neighbors carry the SAME
    label — exactly the per-instance 4-neighbor erosion of the host oracle
    (scoring._contour_length), including the dilated-labels case where
    different instances may touch.
    """
    m, h, w = labels.shape
    p = h * w
    n = max_instances + 1
    big = jnp.int32(1 << 30)

    def same(axis, d):
        rolled = jnp.roll(labels, d, axis=axis)
        eq = rolled == labels
        # out-of-bounds neighbors count as same: the host oracle's erosion
        # (scoring._contour_length) only constrains directions that exist,
        # so border pixels stay interior toward the image edge
        idx = jax.lax.broadcasted_iota(jnp.int32, labels.shape, axis)
        size = labels.shape[axis]
        oob = (idx < d) if d > 0 else (idx >= size + d)
        return eq | oob

    interior = ((labels > 0) & same(1, 1) & same(1, -1)
                & same(2, 1) & same(2, -1))

    flat_l = labels.reshape(m, p)
    flat_p = probabilities.reshape(m, p).astype(jnp.float32)
    flat_i = interior.reshape(m, p)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(p)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(p)
    iota = jnp.arange(n, dtype=jnp.int32)

    hi, lo = _bf16_split(flat_p)
    ones = jnp.ones_like(hi)
    int_b = flat_i.astype(jnp.bfloat16)
    vals = jnp.stack([ones, hi, lo, int_b], axis=1)  # (M, 4, P)

    # pad to a chunk multiple with background pixels: label 0 never emits
    # features (its column is dropped below), so one scan covers everything
    pc = min(pixel_chunk, p)
    pad = -p % pc
    if pad:
        flat_l = jnp.pad(flat_l, ((0, 0), (0, pad)))
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, pad)))
        flat_p = jnp.pad(flat_p, ((0, 0), (0, pad)))
        rows = jnp.pad(rows, (0, pad))
        cols = jnp.pad(cols, (0, pad))

    def reduce_chunk(carry, start):
        sums, pmax, rmin, rmax, cmin, cmax = carry
        lc = jax.lax.dynamic_slice_in_dim(flat_l, start, pc, axis=1)
        vc = jax.lax.dynamic_slice_in_dim(vals, start, pc, axis=2)
        pcv = jax.lax.dynamic_slice_in_dim(flat_p, start, pc, axis=1)
        rc = jax.lax.dynamic_slice(rows, (start,), (pc,))
        cc = jax.lax.dynamic_slice(cols, (start,), (pc,))
        eq = lc[:, :, None] == iota  # (M, pc, N)
        sums = sums + jnp.einsum("bvp,bpn->bvn", vc,
                                 eq.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
        pmax = jnp.maximum(pmax, jnp.max(
            jnp.where(eq, pcv[:, :, None], 0.0), axis=1))
        rmin = jnp.minimum(rmin, jnp.min(
            jnp.where(eq, rc[None, :, None], big), axis=1))
        rmax = jnp.maximum(rmax, jnp.max(
            jnp.where(eq, rc[None, :, None], -1), axis=1))
        cmin = jnp.minimum(cmin, jnp.min(
            jnp.where(eq, cc[None, :, None], big), axis=1))
        cmax = jnp.maximum(cmax, jnp.max(
            jnp.where(eq, cc[None, :, None], -1), axis=1))
        return (sums, pmax, rmin, rmax, cmin, cmax), None

    init = (jnp.zeros((m, 4, n), jnp.float32),
            jnp.zeros((m, n), jnp.float32),
            jnp.full((m, n), big, jnp.int32),
            jnp.full((m, n), -1, jnp.int32),
            jnp.full((m, n), big, jnp.int32),
            jnp.full((m, n), -1, jnp.int32))
    starts = jnp.arange((p + pad) // pc, dtype=jnp.int32) * pc
    (sums, pmax, rmin, rmax, cmin, cmax), _ = jax.lax.scan(
        reduce_chunk, init, starts)

    area = sums[:, 0]
    prob_sum = sums[:, 1] + sums[:, 2]
    interior_count = sums[:, 3]
    # drop background column, keep instances 1..max_instances
    area = area[:, 1:]
    prob_sum = prob_sum[:, 1:]
    interior_count = interior_count[:, 1:]
    pmax = pmax[:, 1:]
    rmin, rmax = rmin[:, 1:], rmax[:, 1:]
    cmin, cmax = cmin[:, 1:], cmax[:, 1:]

    nonempty = area > 0.5
    safe_area = jnp.maximum(area, 1.0)
    mean_prob = prob_sum / safe_area
    bh = (rmax + 1 - rmin).astype(jnp.float32)
    bw = (cmax + 1 - cmin).astype(jnp.float32)
    bh = jnp.maximum(bh, 1.0)
    bw = jnp.maximum(bw, 1.0)
    bbox_ar = bh / bw
    bbox_area = bh * bw
    bbox_fill = area / bbox_area
    d_top = rmin.astype(jnp.float32)
    d_bottom = (h - (rmax + 1)).astype(jnp.float32)
    d_left = cmin.astype(jnp.float32)
    d_right = (w - (cmax + 1)).astype(jnp.float32)
    dmin = jnp.minimum(jnp.minimum(d_top, d_bottom),
                       jnp.minimum(d_left, d_right))
    dmax = jnp.maximum(jnp.maximum(d_top, d_bottom),
                       jnp.maximum(d_left, d_right))
    contour = area - interior_count

    feats = jnp.stack([area, mean_prob, pmax, bbox_ar, bbox_area, bbox_fill,
                       dmin, dmax, contour], axis=-1)
    return jnp.where(nonempty[..., None], feats, 0.0)


@partial(jax.jit, static_argnames=("max_instances",))
def instance_scores(labels, probabilities, max_instances):
    """Reference score: mean masked probability * sqrt(instance area).

    (src/postprocessing.py:228-236.)

    Returns:
        (scores, areas): both (max_instances,) float32/int32 for instances
        1..max_instances; padding slots are 0.
    """
    areas = instance_areas(labels, max_instances)
    sums = instance_prob_sums(labels, probabilities, max_instances)
    areas_i = areas[1:]
    sums_i = sums[1:]
    safe = jnp.maximum(areas_i, 1).astype(jnp.float32)
    scores = (sums_i / safe) * jnp.sqrt(areas_i.astype(jnp.float32))
    scores = jnp.where(areas_i > 0, scores, 0.0)
    return scores, areas_i


@partial(jax.jit, static_argnames=("max_instances",))
def instance_bboxes(labels, max_instances):
    """Bounding boxes (rmin, rmax+1, cmin, cmax+1) per instance via segment
    min/max; matches get_bbox (src/postprocessing.py:340-347).

    Returns (max_instances, 4) int32; empty instances get zeros.
    """
    h, w = labels.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    flat = labels.reshape(-1)
    n = max_instances + 1
    rmin = jax.ops.segment_min(rows, flat, num_segments=n)[1:]
    rmax = jax.ops.segment_max(rows, flat, num_segments=n)[1:]
    cmin = jax.ops.segment_min(cols, flat, num_segments=n)[1:]
    cmax = jax.ops.segment_max(cols, flat, num_segments=n)[1:]
    areas = instance_areas(labels, max_instances)[1:]
    empty = areas == 0
    box = jnp.stack([rmin, rmax + 1, cmin, cmax + 1], axis=-1)
    return jnp.where(empty[:, None], 0, box)


@partial(jax.jit, static_argnames=("max_instances",))
def size_matrix(labels, max_instances):
    """Per-pixel component area; background pixels get 1.

    Matches get_size_matrix (src/preparation.py:189-195).
    """
    areas = instance_areas(labels, max_instances)
    areas = areas.at[0].set(1)
    return areas[labels]
