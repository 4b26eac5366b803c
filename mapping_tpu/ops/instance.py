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
    hi = flat_p.astype(jnp.bfloat16)
    lo = (flat_p - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    vals = jnp.stack([jnp.ones_like(hi), hi, lo], axis=1)  # (M, 3, P)

    def reduce_chunk(lc, vc):
        onehot = (lc[:, :, None] == iota).astype(jnp.bfloat16)  # (M, pc, N)
        return jnp.einsum("bvp,bpn->bvn", vc, onehot,
                          preferred_element_type=jnp.float32)

    pc = min(pixel_chunk, p)
    n_chunks = p // pc

    def step(carry, idx):
        lc = jax.lax.dynamic_slice_in_dim(flat_l, idx, pc, axis=1)
        vc = jax.lax.dynamic_slice_in_dim(vals, idx, pc, axis=2)
        return carry + reduce_chunk(lc, vc), None

    acc, _ = jax.lax.scan(step, jnp.zeros((m, 3, n), jnp.float32),
                          jnp.arange(n_chunks, dtype=jnp.int32) * pc)
    rem = p - n_chunks * pc
    if rem:
        acc = acc + reduce_chunk(flat_l[:, -rem:], vals[:, :, -rem:])
    areas = acc[:, 0].astype(jnp.int32)
    sums = acc[:, 1] + acc[:, 2]
    return areas, sums


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
