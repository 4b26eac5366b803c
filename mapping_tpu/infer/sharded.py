"""Multi-chip fused inference: forward + postprocess sharded over 'data'.

Serving-path equivalent of the data-parallel train step: the batch shards
over the mesh's 'data' axis and every chip runs the WHOLE fused program
(forward -> softmax -> resize -> threshold -> CCL -> scores) on its shard via
shard_map — no cross-chip traffic after the (replicated) params are read.
The per-device body is rank-preserving, so the Pallas CCL kernel runs
per-chip with a local grid.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # moved across jax versions; prefer the stable location
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from mapping_tpu.infer.postprocess import fused_postprocess
from mapping_tpu.parallel.mesh import DATA_AXIS


def make_sharded_infer(apply_fn, mesh: Mesh,
                       target_size: Tuple[int, int] = (300, 300),
                       category_layers: Tuple[int, ...] = (1, 1),
                       active_layers: Tuple[int, ...] = None,
                       erode_size: int = 0,
                       dilate_size: int = 0):
    """Build a jitted (variables, images) -> (labels, scores) program where
    images shard over 'data' and variables replicate.

    apply_fn(variables, images) -> logits (the flax apply with train=False).
    The global batch must divide the data-axis size.
    """

    def per_device(variables, images):
        logits = apply_fn(variables, images)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        labels, scores, _ = fused_postprocess(
            probs, target_size=target_size, category_layers=category_layers,
            erode_size=erode_size, dilate_size=dilate_size,
            active_layers=active_layers)
        return labels, scores

    return _jit_sharded(per_device, mesh)


def _jit_sharded(per_device, mesh):
    kwargs = dict(mesh=mesh, in_specs=(P(), P(DATA_AXIS)),
                  out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
    try:
        # vma checking rejects loop carries that become device-varying
        # (the CCL convergence flag); disable it
        sharded = shard_map(per_device, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax spelling
        sharded = shard_map(per_device, check_rep=False, **kwargs)
    return jax.jit(sharded)


def make_spatial_infer(apply_fn, mesh: Mesh,
                       target_size: Tuple[int, int] = (300, 300),
                       category_layers: Tuple[int, ...] = (1, 1),
                       active_layers: Tuple[int, ...] = None,
                       erode_size: int = 0,
                       dilate_size: int = 0):
    """Spatial partitioning for images too large for one chip's HBM: the
    image HEIGHT shards over the 'data' axis and XLA/GSPMD inserts the halo
    exchanges every conv window needs at shard edges (the scaling-book 'sp'
    recipe: annotate shardings, let the compiler place collectives on ICI).

    The reference has no analog — its biggest unit of work is one 256-512px
    crop on one GPU (src/loaders.py crop_and_pad); this serves a e.g.
    4096x4096 tile as ONE forward pass across the mesh. The FLOP-heavy
    forward runs sharded; the probabilities are resized toward target_size
    PER SHARD (the resize along the sharded H axis is a matmul XLA
    partitions into per-shard partials + a small cross-shard reduction), so
    the gather moves a (N, th, tw, C) map — ~(H/th)x less ICI traffic than
    gathering the full-resolution probabilities (~134 MB/image at 4096²
    before this change). CCL + scoring then run on the small replicated map.

    Returns jitted (variables, images (N, H, W, 3)) -> (labels, scores).
    H must keep the model's divisibility constraint per shard
    (H / data_axis_size divisible by 64 for the ResNet U-Nets).
    """
    spatial = NamedSharding(mesh, P(None, DATA_AXIS))
    replicated = NamedSharding(mesh, P())
    th, tw = target_size

    @jax.jit
    def run(variables, images):
        images = jax.lax.with_sharding_constraint(images, spatial)
        logits = apply_fn(variables, images)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if probs.shape[1:3] != (th, tw):
            probs = jax.image.resize(
                probs, (probs.shape[0], th, tw, probs.shape[-1]), "linear")
        probs = jax.lax.with_sharding_constraint(probs, replicated)
        labels, scores, _ = fused_postprocess(
            probs, target_size=target_size, category_layers=category_layers,
            erode_size=erode_size, dilate_size=dilate_size,
            active_layers=active_layers)
        return labels, scores

    return run


def make_sharded_tta_infer(apply_fn, mesh: Mesh, specs, method: str = "gmean",
                           target_size: Tuple[int, int] = (300, 300),
                           category_layers: Tuple[int, ...] = (1, 1),
                           active_layers: Tuple[int, ...] = None,
                           erode_size: int = 0,
                           dilate_size: int = 0):
    """Mesh-sharded TTA serving: the reference's best-quality inference path
    (TTA expand -> forward -> inverse -> aggregate, src/loaders.py:401-517)
    fused with postprocess and sharded over 'data'.

    Each device expands its local image shard into the V TTA variants,
    runs the forward on the (local_batch * V) stack, inverse-transforms,
    aggregates (gmean default), and postprocesses — all inside one shard_map
    body, so multi-chip TTA needs no cross-chip traffic beyond the
    replicated-params read.
    """
    from mapping_tpu.data.tta import tta_wrap_predict

    def per_device(variables, images):
        def predict(flat):
            logits = apply_fn(variables, flat)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        probs = tta_wrap_predict(predict, specs, method)(images)
        labels, scores, _ = fused_postprocess(
            probs, target_size=target_size, category_layers=category_layers,
            erode_size=erode_size, dilate_size=dilate_size,
            active_layers=active_layers)
        return labels, scores

    return _jit_sharded(per_device, mesh)
