"""Test-time augmentation, fused on device.

Parity target: the reference's TTA generator/aggregator trio
(src/loaders.py:401-517): each image expands into flip x rotation (x optional
color-shift) variants, the network runs on all of them, and predictions are
inverse-transformed and aggregated with mean/max/min/gmean.

The reference generates the variant list with `ud elif lr` application
semantics (src/loaders.py:485-517), so with flips+rotations enabled it emits
16 specs of which the (ud=True, lr=True) ones duplicate (ud=True, lr=False) —
we reproduce the same 16-variant list so aggregation weighting matches.

TPU design: variants are pure flips/rot90s (exact, no interpolation), built
and aggregated inside one jitted program; the reference's per-channel skimage
rotate over a ThreadPool (src/loaders.py:458-517) disappears into the
inference graph.
"""

from itertools import product
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from mapping_tpu.data.augment import color_shift


class TTASpec(NamedTuple):
    ud_flip: bool
    lr_flip: bool
    rotation: int  # degrees CCW, multiple of 90
    color_shift: int  # 0 = off, k>0 = k-th random color run


def tta_specs(flip_ud=True, flip_lr=True, rotation=True,
              color_shift_runs=0) -> List[TTASpec]:
    """Variant list in the reference's generation order
    (src/loaders.py:417-435)."""
    specs = [TTASpec(False, False, 0, 0)]
    ud_options = [True, False] if flip_ud else [False]
    lr_options = [True, False] if flip_lr else [False]
    rot_options = [0, 90, 180, 270] if rotation else [0]
    color_options = (list(range(1, color_shift_runs + 1))
                     if color_shift_runs else [0])
    for ud, lr, rot, color in product(ud_options, lr_options, rot_options,
                                      color_options):
        if not ud and not lr and rot == 0 and not color:
            continue
        specs.append(TTASpec(ud, lr, rot, color))
    return specs


def _forward_one(image, spec: TTASpec, rng=None):
    """(H, W, C): flip (ud elif lr elif color) then rotate CCW — the
    reference's forward order (src/loaders.py:477-486)."""
    if spec.ud_flip:
        image = image[::-1]
    elif spec.lr_flip:
        image = image[:, ::-1]
    elif spec.color_shift:
        key = jax.random.fold_in(rng, spec.color_shift)
        image = color_shift(key, image.astype(jnp.float32))
    return jnp.rot90(image, spec.rotation // 90, axes=(0, 1))


def _inverse_one(pred, spec: TTASpec):
    """(H, W, C) prediction: rotate back then un-flip
    (src/loaders.py:489-496)."""
    pred = jnp.rot90(pred, -(spec.rotation // 90), axes=(0, 1))
    if spec.ud_flip:
        pred = pred[::-1]
    elif spec.lr_flip:
        pred = pred[:, ::-1]
    return pred


def expand_batch(images, specs: Sequence[TTASpec], rng=None):
    """(B, H, W, C) -> (B, V, H, W, C) forward TTA variants.

    Square images only for rotations (H == W), as in the 300x300 tiles.

    Color runs draw a DISTINCT key per image (split over the batch) on top
    of the per-run fold-in — the reference's color_seq sampled fresh
    parameters per crop (src/loaders.py:456-470), so one shared key would
    collapse the ensemble diversity color TTA exists for. The default rng
    keeps inference deterministic per batch position; pass rng to vary.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, images.shape[0])
    variants = [
        jax.vmap(lambda im, k, s=spec: _forward_one(im, s, k))(images, keys)
        for spec in specs
    ]
    return jnp.stack(variants, axis=1)


def inverse_batch(preds, specs: Sequence[TTASpec]):
    """(B, V, H, W, C) predictions -> inverse-transformed, same shape."""
    outs = [
        jax.vmap(lambda p, s=spec: _inverse_one(p, s))(preds[:, i])
        for i, spec in enumerate(specs)
    ]
    return jnp.stack(outs, axis=1)


def aggregate(preds, method: str = "gmean", axis: int = 1, weights=None):
    """Aggregate the variants axis (reference agg_method registry,
    src/loaders.py:443-450).

    weights: optional per-variant multiplicities (from dedupe_specs) so a
    deduped variant stack aggregates identically to the full duplicated one.
    max/min are multiplicity-invariant and ignore weights.
    """
    if weights is not None:
        shape = [1] * preds.ndim
        shape[axis] = -1
        w = jnp.asarray(weights, jnp.float32).reshape(shape)
        total = float(sum(weights))
    if method == "mean":
        if weights is None:
            return jnp.mean(preds, axis=axis)
        return jnp.sum(preds * w, axis=axis) / total
    if method == "max":
        return jnp.max(preds, axis=axis)
    if method == "min":
        return jnp.min(preds, axis=axis)
    if method == "gmean":
        eps = 1e-12
        logs = jnp.log(jnp.maximum(preds, eps))
        if weights is None:
            return jnp.exp(jnp.mean(logs, axis=axis))
        return jnp.exp(jnp.sum(logs * w, axis=axis) / total)
    raise KeyError(f"unknown aggregation method {method!r}")


def dedupe_specs(specs: Sequence[TTASpec]):
    """Collapse transform-identical TTA specs into (unique_specs, weights).

    The reference applies flips with an `ud elif lr` chain
    (src/loaders.py:477-486), so every (ud=True, lr=True, rot) spec performs
    exactly the same transform as (ud=True, lr=False, rot): with the default
    16-spec list, only 12 forwards are unique and the four duplicates carry
    weight 2. Aggregating the unique stack with these weights reproduces the
    16-variant result while saving 25% of the TTA forward FLOPs.
    """
    canon = {}
    order = []
    for spec in specs:
        if spec.ud_flip:
            key = ("ud", spec.rotation)
        elif spec.lr_flip:
            key = ("lr", spec.rotation)
        elif spec.color_shift:
            key = ("color", spec.color_shift, spec.rotation)
        else:
            key = ("id", spec.rotation)
        if key not in canon:
            canon[key] = [spec, 0]
            order.append(key)
        canon[key][1] += 1
    return ([canon[k][0] for k in order], [canon[k][1] for k in order])


def tta_wrap_predict(predict_probs, specs: Sequence[TTASpec],
                     method: str = "gmean", dedupe: bool = True):
    """Wrap a (images -> probs) function with fused TTA.

    predict_probs: (N, H, W, 3-ish) -> (N, H, W, C), typically the jitted
    forward+softmax. Returns a function (B, H, W, C_in) -> aggregated
    (B, H, W, C) probabilities; the whole expand/forward/inverse/aggregate
    chain stays on device.

    dedupe=True (default) collapses transform-identical specs and aggregates
    with multiplicity weights — same output as running every spec, fewer
    forwards (16 -> 12 on the reference's default spec list).
    """
    weights = None
    if dedupe:
        specs, counts = dedupe_specs(specs)
        if any(c > 1 for c in counts):
            weights = counts
    v = len(specs)

    def run(images, rng=None):
        b = images.shape[0]
        expanded = expand_batch(images, specs, rng)
        flat = expanded.reshape((b * v,) + expanded.shape[2:])
        probs = predict_probs(flat)
        probs = probs.reshape((b, v) + probs.shape[1:])
        probs = inverse_batch(probs, specs)
        return aggregate(probs, method, weights=weights)

    return run
