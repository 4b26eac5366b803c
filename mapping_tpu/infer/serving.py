"""Product serving: forward(+TTA) + postprocess fused into ONE dispatch.

This is the pipeline-facing realization of the SURVEY §7 design stance
("predict+postprocess is a single jitted program... only RLE bytes leave the
device"): the whole chain

    images -> [TTA expand -> forward -> inverse -> aggregate | forward]
           -> softmax -> [center-crop] -> resize -> threshold
           -> erode/restore -> CCL -> dilate -> scores [-> features]

compiles into a single XLA program per batch shape, so only the compact
labels/scores/areas (and optionally the per-instance feature tensor) are
pulled to host. The reference's equivalent surface was its pipelines
(src/pipelines.py:55-155), where every arrow above was a separate host Step
shuttling full probability maps between processes.

Execution modes (selected by the pipeline from the config):
 - single device: plain jit;
 - mesh data-parallel (`data_parallel: 1`): the batch shards over the mesh's
   'data' axis via shard_map — every chip runs the whole fused body on its
   shard, no cross-chip traffic after the replicated-params read;
 - spatial (`spatial_serving: 1`): one huge image's HEIGHT shards over the
   mesh and GSPMD inserts the conv halo exchanges; probabilities are resized
   toward target_size PER SHARD before the gather, so the collective moves
   the small map, not the full-resolution one.

Overflow safety: the fused program pads per-instance outputs to
`max_instances` but CCL is uncapped; images whose component count exceeds the
pad are re-run (forward included — overflow is rare, the recompile amortizes)
through a single-device program with a doubled pad, up to
MAX_INSTANCES_CEILING (the same contract as
infer.postprocess.postprocess_probabilities).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # moved across jax versions; prefer the stable location
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from mapping_tpu.infer.postprocess import (MAX_INSTANCES,
                                           MAX_INSTANCES_CEILING,
                                           fused_postprocess)
from mapping_tpu.parallel.mesh import DATA_AXIS
from mapping_tpu.utils.logging import get_logger

logger = get_logger()


class FusedServe:
    """One callable serving program: images -> numpy
    (labels (B, L, th, tw), scores (B, L, N), areas (B, L, N)
    [, features (B, L, N, 9)]).

    probs_fn(params, images) -> (N, H, W, C) softmax probabilities — a pure
    function (typically the BN-folded forward from
    UNetTrainer.probs_apply_fn); get_params() -> the current params pytree,
    consulted at every call so weight updates/loads are always served.
    """

    def __init__(self, probs_fn, get_params, *,
                 target_size: Tuple[int, int],
                 category_layers: Tuple[int, ...],
                 active_layers: Optional[Tuple[int, ...]] = None,
                 erode_size: int = 0,
                 dilate_size: int = 0,
                 crop_size: Optional[Tuple[int, int]] = None,
                 tta_specs: Optional[Sequence] = None,
                 tta_method: str = "gmean",
                 compute_features: bool = False,
                 max_instances: int = MAX_INSTANCES,
                 mesh: Optional[Mesh] = None,
                 spatial: bool = False):
        if spatial and mesh is None:
            raise ValueError("spatial serving requires a device mesh")
        if spatial and tta_specs:
            raise ValueError("spatial serving does not support TTA "
                             "(rotations need square shard-local tiles)")
        self._probs_fn = probs_fn
        self._get_params = get_params
        self._post = dict(target_size=tuple(target_size),
                          category_layers=tuple(category_layers),
                          active_layers=active_layers,
                          erode_size=int(erode_size),
                          dilate_size=int(dilate_size))
        self._crop_size = tuple(crop_size) if crop_size else None
        self._tta_specs = list(tta_specs) if tta_specs else None
        self._tta_method = tta_method
        self._compute_features = bool(compute_features)
        self._base_max_instances = int(max_instances)
        self._mesh = mesh
        self._spatial = bool(spatial)
        self._programs = {}

    # ------------------------------------------------------------- build
    def _probs(self, params, images):
        if self._tta_specs:
            from mapping_tpu.data.tta import tta_wrap_predict

            run = tta_wrap_predict(lambda flat: self._probs_fn(params, flat),
                                   self._tta_specs, self._tta_method)
            probs = run(images)
        else:
            probs = self._probs_fn(params, images)
        if self._crop_size is not None:
            h, w = probs.shape[1:3]
            ch, cw = self._crop_size
            top, left = (h - ch) // 2, (w - cw) // 2
            probs = probs[:, top:top + ch, left:left + cw]
        return probs

    def _body(self, max_instances):
        def body(params, images):
            probs = self._probs(params, images)
            outs = fused_postprocess(
                probs, max_instances=max_instances,
                compute_features=self._compute_features, **self._post)
            return (_labels_i16(outs[0]),) + tuple(outs[1:])

        return body

    def _program(self, max_instances, use_mesh):
        key = (max_instances, use_mesh)
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        body = self._body(max_instances)
        if use_mesh and self._spatial:
            prog = self._spatial_program(max_instances)
        elif use_mesh:
            n_out = 4 if self._compute_features else 3
            kwargs = dict(mesh=self._mesh,
                          in_specs=(P(), P(DATA_AXIS)),
                          out_specs=tuple([P(DATA_AXIS)] * n_out))
            try:
                # vma checking rejects loop carries that become
                # device-varying (the CCL convergence flag); disable it
                sharded = shard_map(body, check_vma=False, **kwargs)
            except TypeError:  # pragma: no cover - older jax spelling
                sharded = shard_map(body, check_rep=False, **kwargs)
            prog = jax.jit(sharded)
        else:
            prog = jax.jit(body)
        self._programs[key] = prog
        return prog

    def _spatial_program(self, max_instances):
        """GSPMD height-sharded program: conv halos ride ICI; the gather
        happens AFTER a per-shard resize toward target_size so the
        collective moves a (B, th, tw, C) map, not the full-res one
        (shard-aware postprocess — the resize along sharded H is a matmul
        XLA partitions into per-shard partials + a small reduction)."""
        spatial = NamedSharding(self._mesh, P(None, DATA_AXIS))
        replicated = NamedSharding(self._mesh, P())
        th, tw = self._post["target_size"]

        def run(params, images):
            images = jax.lax.with_sharding_constraint(images, spatial)
            probs = self._probs(params, images)
            # resize W FIRST: W is unsharded so that pass is shard-local;
            # the H pass then contracts over the sharded axis with partials
            # already at (…, th, tw, C). A single 2-D resize lets XLA do H
            # first, all-reducing (th, 1, W_full, C) partials — full-width
            # traffic (observed in HLO before this split).
            probs = probs.astype(jnp.float32)
            b, c = probs.shape[0], probs.shape[-1]
            if probs.shape[2] != tw:
                probs = jax.image.resize(
                    probs, (b, probs.shape[1], tw, c), "linear")
            if probs.shape[1] != th:
                probs = jax.image.resize(probs, (b, th, tw, c), "linear")
            probs = jax.lax.with_sharding_constraint(probs, replicated)
            outs = fused_postprocess(
                probs, max_instances=max_instances,
                compute_features=self._compute_features, **self._post)
            return (_labels_i16(outs[0]),) + tuple(outs[1:])

        return jax.jit(run)

    # ------------------------------------------------- param-source hooks
    def enable_async_recalibration(self) -> bool:
        """Online-serving mode for a quantized param source: on weight
        drift, serve the previous int8 snapshot while the qtable rebuilds
        on a background thread (models/quantize.py get_packed.set_async).
        No-op (False) for float param sources."""
        hook = getattr(self._get_params, "set_async", None)
        if hook is None:
            return False
        hook(True)
        return True

    def recalibration_stats(self):
        """{'recalibrations', 'serving_stale_batches'} from a quantized
        param source; {} for float serving."""
        return dict(getattr(self._get_params, "stats", {}) or {})

    # -------------------------------------------------------------- call
    def dispatch(self, images):
        """Enqueue the fused program for one batch WITHOUT syncing: stages
        the batch H2D, reads current params, and returns an opaque handle of
        device arrays (JAX async dispatch — the chip starts immediately).
        Pair with collect(); a serving loop that dispatches batch k+1 before
        collecting batch k overlaps host decode + D2H of k with device
        compute of k+1 (the reference overlapped via DataLoader worker
        processes, src/pytorch_utils.py num_workers; here one in-flight
        program suffices because postprocessing is on-device)."""
        images = jnp.asarray(images)
        params = self._get_params()
        prog = self._program(self._base_max_instances,
                             use_mesh=self._mesh is not None)
        return prog(params, images), params, images

    def collect(self, handle):
        """Sync a dispatch() handle: pull outputs to host and run the
        overflow-escalation protocol (which may re-dispatch the dense
        images single-device with a wider instance pad)."""
        outs_d, params, images = handle
        max_inst = self._base_max_instances
        outs = [np.asarray(o) for o in outs_d]
        # overflow escalation: re-run just the dense images, single-device,
        # with a doubled instance pad (rare; each pad compiles once)
        while True:
            counts = outs[0].max(axis=(1, 2, 3))
            overflow = np.where(counts > max_inst)[0]
            if overflow.size == 0:
                return tuple(outs)
            if max_inst >= MAX_INSTANCES_CEILING:
                logger.warning(
                    "serve: %d image(s) exceed the instance-pad ceiling %d "
                    "(max components %d); tail instances dropped",
                    overflow.size, MAX_INSTANCES_CEILING, int(counts.max()))
                return tuple(outs)
            logger.info(
                "serve: %d image(s) overflow instance pad %d (max components "
                "%d); re-running them padded to %d", overflow.size, max_inst,
                int(counts.max()), max_inst * 2)
            max_inst *= 2
            retry = self._program(max_inst, use_mesh=False)
            retried = [np.asarray(o)
                       for o in retry(params, images[overflow])]
            outs = _merge_overflow(outs, retried, overflow)

    def __call__(self, images):
        return self.collect(self.dispatch(images))

    # convenient for tests / introspection
    @property
    def compiled_keys(self):
        return sorted(self._programs)


def _labels_i16(labels):
    """Labels are the dominant D2H of the serving program (B, L, th, tw);
    int16 halves the pull. CCL ids are UNCAPPED consecutive integers, so
    clamp before narrowing: a pathological map with >32767 components would
    otherwise wrap negative, break the overflow-escalation detection
    (counts = labels.max()), and feed negative instance counts downstream.
    Clamped ids stay above every escalation pad (ceiling 4096), so detection
    and the documented tail-drop semantics are unchanged."""
    return jnp.minimum(labels, jnp.int32(32767)).astype(jnp.int16)


def _merge_overflow(outs, retried, overflow):
    """Overwrite the overflow rows; outputs beyond labels pad along the
    instances axis (2) to the retry width."""
    merged = [outs[0].copy()]
    merged[0][overflow] = retried[0]
    for out, out_r in zip(outs[1:], retried[1:]):
        pad = out_r.shape[2] - out.shape[2]
        widths = [(0, 0)] * out.ndim
        widths[2] = (0, pad)
        out = np.pad(out, widths)
        out[overflow] = out_r
        merged.append(out)
    return merged
