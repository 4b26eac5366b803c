"""Mask postprocessing fused into one jitted device program.

Reference chain (src/pipelines.py:248-304, src/postprocessing.py): per image
on host — resize C×H×W probabilities to 300×300 (:48-61), threshold each
category channel per CATEGORY_LAYERS (:77-84), erode + restore dropped
objects (:135-156), connected-component label per layer (:127-132), dilate
(:159-180), then score every instance as mean masked probability × sqrt(area)
(:228-236). Here the whole chain is a single XLA program over the batch:
CCL is the label-propagation kernel (ops/ccl.py), morphology is
lax.reduce_window, per-instance reductions are segment-sums over a fixed
MAX_INSTANCES padding (the jit-friendly answer to dynamic instance counts).
"""

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mapping_tpu.ops.ccl import connected_components
from mapping_tpu.ops.instance import (instance_areas_and_prob_sums,
                                      instance_feature_tensor,
                                      instance_prob_sums)
from mapping_tpu.ops.morphology import dilate, erode

MAX_INSTANCES = 256


def layer_thresholds(category_layers: Sequence[int]):
    """Per-layer (threshold, category_channel) list: n layers per category
    with thresholds arange(step, 1, step), step = 1/(n+1)
    (reference categorize_multilayer_image, src/postprocessing.py:77-84)."""
    out = []
    for cat_ch, n_layers in enumerate(category_layers):
        step = 1.0 / (n_layers + 1)
        for t in np.arange(step, 1.0 - 1e-9, step):
            out.append((float(t), cat_ch))
    return out


def _restore_erased(binary, eroded, n=MAX_INSTANCES):
    """add_dropped_objects (src/utils.py:333-339): components of `binary`
    with no surviving pixel after erosion come back un-eroded."""
    labels = connected_components(binary)
    survived = jax.vmap(
        lambda lab, ero: instance_prob_sums(lab, ero.astype(jnp.float32), n)
    )(labels.reshape((-1,) + labels.shape[-2:]),
      eroded.reshape((-1,) + eroded.shape[-2:]))
    survived = survived.reshape(labels.shape[:-2] + (n + 1,))
    # per-pixel: does my component survive? (labels beyond the instance pad
    # clamp to the last slot — out-of-range gathers would read garbage)
    idx = jnp.minimum(labels, n).astype(jnp.int32)
    alive = jnp.take_along_axis(
        survived.reshape((-1, n + 1)),
        idx.reshape((-1, labels.shape[-2] * labels.shape[-1])),
        axis=1,
    ).reshape(labels.shape) > 0
    return jnp.where(binary & ~alive, True, eroded)


@partial(jax.jit, static_argnames=("target_size", "category_layers",
                                   "erode_size", "dilate_size",
                                   "max_instances", "active_layers",
                                   "compute_features"))
def fused_postprocess(
    probs,
    target_size: Tuple[int, int] = (300, 300),
    category_layers: Tuple[int, ...] = (1, 1),
    erode_size: int = 0,
    dilate_size: int = 0,
    max_instances: int = MAX_INSTANCES,
    active_layers: Tuple[int, ...] = None,
    compute_features: bool = False,
):
    """probs (B, H, W, C) float -> labels (B, L, th, tw) int32,
    scores (B, L, max_instances) f32, areas (B, L, max_instances) i32
    [, features (B, L, max_instances, 9) f32 when compute_features].

    L = sum(category_layers); layer l uses its category's prob channel for
    scoring (searchsorted mapping, reference src/postprocessing.py:274-283).

    active_layers: layer indices that actually need CCL/scores (layers whose
    category is emitted — CATEGORY_IDS[c] is None for background, and the
    reference never reads background instances either: create_annotations
    skips them (src/utils.py:95-99) and the scoring path drops layer 0
    features (src/models.py:457-462)). Inactive layers return zero labels.
    None means all layers.

    compute_features=True additionally emits the per-instance scoring
    feature tensor (ops.instance.FEATURE_COLUMNS order) for the second-level
    scoring models — the reference extracted these per instance on host
    (src/postprocessing.py:261-303); here they never leave the device until
    the compact table is pulled.
    """
    b = probs.shape[0]
    th, tw = target_size
    if probs.shape[1:3] == (th, tw):
        # already at target size (e.g. the spatial serving path resizes
        # per-shard before the gather) — skip the resize stage
        probs_r = probs.astype(jnp.float32)
    else:
        probs_r = jax.image.resize(
            probs.astype(jnp.float32),
            (b, th, tw, probs.shape[-1]), "linear")

    specs = layer_thresholds(category_layers)
    L = len(specs)
    if active_layers is None:
        active_layers = tuple(range(L))
    active = list(active_layers)

    binary = jnp.stack(
        [probs_r[..., specs[l][1]] > specs[l][0] for l in active], axis=1)

    if erode_size > 0:
        eroded = erode(binary.astype(jnp.uint8), erode_size).astype(bool)
        binary = _restore_erased(binary, eroded, n=max_instances)

    labels_a = connected_components(binary)  # (B, LA, th, tw)

    if dilate_size > 0:
        # reference dilates the *labeled* image (grayscale max dilation,
        # src/postprocessing.py:159-180)
        labels_a = dilate(labels_a, dilate_size)

    layer_probs = jnp.stack([probs_r[..., specs[l][1]] for l in active], axis=1)
    flat_labels = labels_a.reshape((-1, th, tw))
    flat_probs = layer_probs.reshape((-1, th, tw))
    # dense one-hot matmul reductions (MXU) — segment_sum scatters serialize
    # on TPU and were the postprocess hot spot alongside renumbering
    areas, sums = instance_areas_and_prob_sums(flat_labels, flat_probs,
                                               max_instances)
    areas_i = areas[:, 1:]
    sums_i = sums[:, 1:]
    safe = jnp.maximum(areas_i, 1).astype(jnp.float32)
    scores_a = (sums_i / safe) * jnp.sqrt(areas_i.astype(jnp.float32))
    scores_a = jnp.where(areas_i > 0, scores_a, 0.0)

    la = len(active)
    labels = jnp.zeros((b, L, th, tw), jnp.int32)
    scores = jnp.zeros((b, L, max_instances), jnp.float32)
    areas_out = jnp.zeros((b, L, max_instances), jnp.int32)
    idx = jnp.asarray(active)
    labels = labels.at[:, idx].set(labels_a)
    scores = scores.at[:, idx].set(scores_a.reshape(b, la, max_instances))
    areas_out = areas_out.at[:, idx].set(
        areas_i.reshape(b, la, max_instances))
    if not compute_features:
        return labels, scores, areas_out
    feats_a = instance_feature_tensor(flat_labels, flat_probs, max_instances)
    features = jnp.zeros((b, L, max_instances, feats_a.shape[-1]),
                         jnp.float32)
    features = features.at[:, idx].set(
        feats_a.reshape(b, la, max_instances, feats_a.shape[-1]))
    return labels, scores, areas_out, features


def active_layers_for(category_ids, category_layers) -> Tuple[int, ...]:
    """Layer indices whose category is emitted (CATEGORY_IDS entry not None)."""
    out = []
    layer = 0
    for cat_ch, n_layers in enumerate(category_layers):
        for _ in range(n_layers):
            if category_ids[cat_ch] is not None:
                out.append(layer)
            layer += 1
    return tuple(out)


#: escalation ceiling for images denser than the default instance pad
MAX_INSTANCES_CEILING = 4096


def postprocess_probabilities(probs, **kwargs):
    """Convenience host wrapper returning numpy outputs.

    Overflow-safe: the fused program pads per-instance outputs to
    `max_instances`, but CCL itself is uncapped — an image with more
    components than the pad would silently lose the tail (the reference's
    host path had no cap at all, src/postprocessing.py:127-132). Detect
    `labels.max() > max_instances` per image and re-run just the dense
    images with a doubled pad (each distinct pad compiles once; overflow is
    rare so the recompile is amortized), up to MAX_INSTANCES_CEILING.
    """
    probs = jnp.asarray(probs)
    max_instances = kwargs.get("max_instances", MAX_INSTANCES)
    outs = [np.asarray(o) for o in fused_postprocess(probs, **kwargs)]
    labels = outs[0]
    counts = labels.max(axis=(1, 2, 3))
    overflow = np.where(counts > max_instances)[0]
    if overflow.size == 0:
        return tuple(outs)
    if max_instances >= MAX_INSTANCES_CEILING:
        from mapping_tpu.utils.logging import get_logger

        get_logger().warning(
            "postprocess: %d image(s) exceed the instance-pad ceiling %d "
            "(max components %d); tail instances will be dropped",
            overflow.size, MAX_INSTANCES_CEILING, int(counts.max()))
        return tuple(outs)
    from mapping_tpu.utils.logging import get_logger

    get_logger().info(
        "postprocess: %d image(s) overflow instance pad %d "
        "(max components %d); re-running them padded to %d",
        overflow.size, max_instances, int(counts.max()), max_instances * 2)
    retry_kwargs = dict(kwargs)
    retry_kwargs["max_instances"] = max_instances * 2
    retried = postprocess_probabilities(probs[overflow], **retry_kwargs)
    # np.asarray over device arrays is read-only -> copy before writing the
    # overflow rows. Outputs beyond labels pad along the instances axis (2).
    merged = [labels.copy()]
    merged[0][overflow] = retried[0]
    for out, out_r in zip(outs[1:], retried[1:]):
        pad = out_r.shape[2] - out.shape[2]
        widths = [(0, 0)] * out.ndim
        widths[2] = (0, pad)
        out = np.pad(out, widths)
        out[overflow] = out_r
        merged.append(out)
    return tuple(merged)
