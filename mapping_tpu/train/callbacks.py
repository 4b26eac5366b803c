"""Training callbacks: monitors, early stopping, checkpointing, timing,
metric sinks, per-epoch COCO-AP validation.

Parity targets: the reference callback framework
(src/steps/pytorch/callbacks.py:14-371 — hooks, CallbackList fan-out,
validation-loss memoization per epoch) and the segmentation-specific
ValidationMonitorSegmentation running a real COCO AP each epoch
(src/callbacks.py:108-200). The Neptune channel senders become a pluggable
MetricSink (stdout + JSONL), per SURVEY.md §5.
"""

import json
import os
import time
from collections import defaultdict, deque
from typing import List, Optional

import numpy as np

from mapping_tpu.utils.logging import get_logger

logger = get_logger()


class MetricSink:
    """stdout + optional JSONL channel sink (neptune send_metric analog)."""

    def __init__(self, jsonl_path: Optional[str] = None):
        self.jsonl_path = jsonl_path

    def send(self, channel: str, x: float, y: float):
        if self.jsonl_path:
            # lazy dir creation: constructing a manager (e.g. `--help`)
            # should not scaffold experiment directories
            os.makedirs(os.path.dirname(self.jsonl_path) or ".", exist_ok=True)
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"channel": channel, "x": float(x),
                                    "y": float(y), "ts": time.time()}) + "\n")

    def send_metric(self, name: str, value: float):
        logger.info("metric %s = %s", name, value)
        self.send(name, 0, value)


class Callback:
    def __init__(self):
        self.trainer = None
        self.validation_datagen = None
        self.meta_valid = None
        self.epoch_id = 0
        self.batch_id = 0

    def set_params(self, trainer, validation_datagen=None, meta_valid=None):
        self.trainer = trainer
        self.validation_datagen = validation_datagen
        self.meta_valid = meta_valid

    def on_train_begin(self, *a, **kw):
        # a ResumeCheckpoint (which runs first in the CallbackList) may have
        # published resume_info: the epoch schedule continues, not restarts
        self.epoch_id = self._resume_info().get("next_epoch", 0)
        self.batch_id = 0

    def on_train_end(self, *a, **kw):
        pass

    # -- resume protocol (failure recovery, SURVEY.md §5) -------------------
    def _resume_info(self) -> dict:
        return getattr(self.trainer, "resume_info", None) or {}

    def _resume_state(self) -> Optional[dict]:
        """This callback's own persisted state from the resume checkpoint
        (keyed by class name; one instance per class in the default list)."""
        return self._resume_info().get("callbacks", {}).get(
            type(self).__name__)

    def state_dict(self) -> dict:
        """JSON-serializable state persisted into the resume checkpoint.
        Default: nothing."""
        return {}

    def on_epoch_begin(self, *a, **kw):
        pass

    def on_epoch_end(self, *a, **kw):
        self.epoch_id += 1

    def on_batch_begin(self, *a, **kw):
        pass

    def on_batch_end(self, *a, **kw):
        self.batch_id += 1

    def training_break(self, *a, **kw):
        return False

    def get_validation_loss(self):
        """Per-epoch memoized validation metrics shared through the trainer
        (reference Callback.get_validation_loss, callbacks.py:56-59)."""
        if self.epoch_id not in self.trainer.validation_loss:
            self.trainer.validation_loss[self.epoch_id] = (
                self.trainer.score_validation(self.validation_datagen))
        return self.trainer.validation_loss[self.epoch_id]


class CallbackList(Callback):
    def __init__(self, callbacks: Optional[List[Callback]] = None):
        super().__init__()
        self.callbacks = list(callbacks or [])

    def __len__(self):
        return len(self.callbacks)

    def set_params(self, *a, **kw):
        for c in self.callbacks:
            c.set_params(*a, **kw)

    def on_train_begin(self, *a, **kw):
        for c in self.callbacks:
            c.on_train_begin(*a, **kw)

    def on_train_end(self, *a, **kw):
        for c in self.callbacks:
            c.on_train_end(*a, **kw)

    def on_epoch_begin(self, *a, **kw):
        for c in self.callbacks:
            c.on_epoch_begin(*a, **kw)

    def on_epoch_end(self, *a, **kw):
        for c in self.callbacks:
            c.on_epoch_end(*a, **kw)

    def on_batch_begin(self, *a, **kw):
        for c in self.callbacks:
            c.on_batch_begin(*a, **kw)

    def on_batch_end(self, *a, **kw):
        for c in self.callbacks:
            c.on_batch_end(*a, **kw)

    def training_break(self, *a, **kw):
        return any(c.training_break(*a, **kw) for c in self.callbacks)

    def state_dicts(self) -> dict:
        """Per-callback resume states, keyed by class name (empty states
        dropped)."""
        out = {}
        for c in self.callbacks:
            state = c.state_dict()
            if state:
                out[type(c).__name__] = state
        return out


class TrainingMonitor(Callback):
    """Running batch/epoch loss averages (reference :107-144)."""

    def __init__(self, batch_every=1, epoch_every=1):
        super().__init__()
        self.batch_every = batch_every
        self.epoch_every = epoch_every
        self.epoch_losses = defaultdict(list)

    def on_epoch_begin(self, *a, **kw):
        self.epoch_losses = defaultdict(list)

    def on_batch_end(self, metrics=None, **kw):
        metrics = metrics or {}
        for name, value in metrics.items():
            self.epoch_losses[name].append(float(value))
        if self.batch_every and self.batch_id % self.batch_every == 0:
            msg = " ".join(f"{k}={float(v):.5f}" for k, v in metrics.items())
            logger.info("epoch %d batch %d %s", self.epoch_id, self.batch_id, msg)
        super().on_batch_end(**kw)

    def on_epoch_end(self, *a, **kw):
        if self.epoch_every and self.epoch_id % self.epoch_every == 0:
            for name, values in self.epoch_losses.items():
                logger.info("epoch %d avg %s = %.5f", self.epoch_id, name,
                            float(np.mean(values)))
        super().on_epoch_end(*a, **kw)


class ValidationMonitor(Callback):
    """Per-epoch validation loss (reference :147-167)."""

    def __init__(self, epoch_every=1, **_):
        super().__init__()
        self.epoch_every = epoch_every

    def on_epoch_end(self, *a, **kw):
        if self.validation_datagen is not None and (
                self.epoch_every and self.epoch_id % self.epoch_every == 0):
            loss = self.get_validation_loss()
            for name, value in loss.items():
                logger.info("epoch %d validation %s = %.5f", self.epoch_id,
                            name, float(value))
        super().on_epoch_end(*a, **kw)


class ValidationMonitorSegmentation(ValidationMonitor):
    """Per-epoch real COCO AP on the validation set, used as the 'sum'
    metric for checkpoint/early-stop (reference src/callbacks.py:108-200).

    Runs the jitted predict + fused postprocess over the validation datagen,
    writes a temp prediction json, and calls coco_evaluation.
    """

    def __init__(self, data_dir=None, validate_with_map=True,
                 small_annotations_size=14, epoch_every=1,
                 target_size=(300, 300), category_layers=(1, 1), **_):
        super().__init__(epoch_every=epoch_every)
        self.data_dir = data_dir
        self.validate_with_map = validate_with_map
        self.small_annotations_size = small_annotations_size
        # geometry comes from the run's config (crop_image_h/w and the
        # category_layers override), NOT literals: a dataset evaluated at a
        # different resolution would otherwise checkpoint/early-stop on an
        # AP computed at the wrong size (the reference monitor read its
        # pipeline config the same way, src/callbacks.py:108-151)
        self.target_size = tuple(target_size)
        self.category_layers = tuple(category_layers)
        self._serve = None

    def _serve_program(self):
        """One fused forward+postprocess dispatch per val batch (the same
        FusedServe the pipelines serve with); params are read live so the
        program follows training without recompiling."""
        if self._serve is None:
            from mapping_tpu.constants import CATEGORY_IDS
            from mapping_tpu.infer.postprocess import active_layers_for
            from mapping_tpu.infer.serving import FusedServe

            probs_fn, get_params = self.trainer.probs_apply_fn()
            self._serve = FusedServe(
                probs_fn, get_params, target_size=self.target_size,
                category_layers=self.category_layers,
                active_layers=active_layers_for(CATEGORY_IDS,
                                                self.category_layers),
                mesh=self.trainer.mesh)
        return self._serve

    def get_validation_loss(self):
        if not self.validate_with_map or self.meta_valid is None:
            return super().get_validation_loss()
        if self.epoch_id not in self.trainer.validation_loss:
            ap = self._map_validation()
            self.trainer.validation_loss[self.epoch_id] = {
                "sum": np.asarray(ap)}
        return self.trainer.validation_loss[self.epoch_id]

    def _map_validation(self):
        import tempfile

        from mapping_tpu.constants import CATEGORY_IDS
        from mapping_tpu.eval import coco_evaluation
        from mapping_tpu.infer import create_annotations

        gt_path = os.path.join(self.data_dir, "val", "annotation.json")
        image_ids = list(self.meta_valid["ImageId"].values)
        serve = self._serve_program()
        annotations = []
        idx = 0
        flow, steps = self.validation_datagen
        for batch_id, batch in enumerate(flow):
            images = batch["image"] if isinstance(batch, dict) else batch
            labels, scores, _ = serve(images)
            batch_ids = image_ids[idx: idx + labels.shape[0]]
            idx += labels.shape[0]
            annotations.extend(create_annotations(
                batch_ids, labels, scores, CATEGORY_IDS,
                self.category_layers))
            if batch_id + 1 >= steps:
                break
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(annotations, f)
            pred_path = f.name
        try:
            ap, _ = coco_evaluation(
                gt_path, pred_path, image_ids,
                [cid for cid in CATEGORY_IDS if cid is not None],
                self.small_annotations_size, verbose=False)
        finally:
            os.unlink(pred_path)
        logger.info("epoch %d validation mAP = %.5f", self.epoch_id, ap)
        return ap


class EarlyStopping(Callback):
    """Patience on validation 'sum' (reference :170-201)."""

    def __init__(self, patience=30, minimize=True, **_):
        super().__init__()
        self.patience = patience
        self.minimize = minimize
        self.best = None
        self.since_best = 0
        self._break = False

    def on_train_begin(self, *a, **kw):
        super().on_train_begin(*a, **kw)
        self.best = None
        self.since_best = 0
        self._break = False
        resumed = self._resume_state()
        if resumed:
            self.best = resumed.get("best")
            self.since_best = int(resumed.get("since_best", 0))

    def state_dict(self):
        return {"best": self.best, "since_best": self.since_best}

    def on_epoch_end(self, *a, **kw):
        if self.validation_datagen is not None or self.meta_valid is not None:
            value = float(np.asarray(self.get_validation_loss()["sum"]))
            improved = (self.best is None or
                        (value < self.best if self.minimize else value > self.best))
            if improved:
                self.best = value
                self.since_best = 0
            else:
                self.since_best += 1
            if self.since_best > self.patience:
                self._break = True
        super().on_epoch_end(*a, **kw)

    def training_break(self, *a, **kw):
        return self._break


class ModelCheckpoint(Callback):
    """Keep the best checkpoint by validation 'sum' (reference :244-279).

    The best state is held in host RAM (one device pull per improvement);
    serializing ~0.5 GB of msgpack per improving epoch dominated wall time on
    a 1-core host, so disk writes are throttled: an improved best is flushed
    to best.msgpack at most every `write_every` epochs (plus once at train
    end), bounding crash loss to `write_every` epochs of best-weight
    progress instead of the whole run."""

    def __init__(self, checkpoint_dir, minimize=True, epoch_every=1,
                 write_every=5, **_):
        super().__init__()
        self.checkpoint_dir = checkpoint_dir
        self.minimize = minimize
        self.epoch_every = epoch_every
        self.write_every = write_every
        self.best = None
        self._best_state = None
        self._dirty = False
        self._last_write_epoch = None

    @property
    def best_path(self):
        return os.path.join(self.checkpoint_dir, "best.msgpack")

    def on_train_begin(self, *a, **kw):
        super().on_train_begin(*a, **kw)
        self.best = None
        self._best_state = None
        self._dirty = False
        self._last_write_epoch = None
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        resumed = self._resume_state()
        if resumed:
            # best score survives the kill; the best WEIGHTS live in
            # best.msgpack on disk (trainer.fit reloads it at train end), so
            # only an actually-improving epoch overwrites them
            self.best = resumed.get("best")
            lw = resumed.get("last_write_epoch")
            self._last_write_epoch = None if lw is None else int(lw)

    def state_dict(self):
        return {"best": self.best,
                "last_write_epoch": self._last_write_epoch}

    def on_epoch_end(self, *a, **kw):
        if self.epoch_every and self.epoch_id % self.epoch_every == 0:
            if self.validation_datagen is not None or self.meta_valid is not None:
                value = float(np.asarray(self.get_validation_loss()["sum"]))
            else:
                value = None
            improved = (value is None or self.best is None or
                        (value < self.best if self.minimize else value > self.best))
            if improved:
                import jax

                if value is not None:
                    self.best = value
                # host copy now (the step donates device buffers later);
                # weights only — the reference's checkpoint was the
                # state_dict, not the optimizer (steps/pytorch/callbacks.py:
                # 244-279), and it's a third of the transfer
                self._best_state = {
                    "params": jax.device_get(self.trainer.state.params),
                    "batch_stats": jax.device_get(
                        self.trainer.state.batch_stats),
                }
                logger.info("epoch %d new best checkpoint (score=%s)",
                            self.epoch_id, value)
                self._dirty = True
        if self._dirty and self.write_every and (
                self._last_write_epoch is None
                or self.epoch_id - self._last_write_epoch >= self.write_every):
            self._write_best()
        super().on_epoch_end(*a, **kw)

    def _write_best(self):
        import flax

        os.makedirs(self.checkpoint_dir, exist_ok=True)
        data = flax.serialization.to_bytes(self._best_state)
        tmp = self.best_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, self.best_path)
        self._dirty = False
        self._last_write_epoch = self.epoch_id
        logger.info("best checkpoint written to %s (score=%s)",
                    self.best_path, self.best)

    def on_train_end(self, *a, **kw):
        if self._best_state is not None and self._dirty:
            self._write_best()
        super().on_train_end(*a, **kw)


class ExperimentTiming(Callback):
    """Epoch wall time + rolling mean batch time (reference :325-371)."""

    def __init__(self, batch_every=10, epoch_every=1, **_):
        super().__init__()
        self.batch_every = batch_every
        self.epoch_every = epoch_every
        self.batch_times = deque(maxlen=100)
        self._epoch_start = None
        self._batch_start = None

    def on_epoch_begin(self, *a, **kw):
        self._epoch_start = time.time()

    def on_epoch_end(self, *a, **kw):
        if self.epoch_every and self.epoch_id % self.epoch_every == 0:
            logger.info("epoch %d took %.2fs", self.epoch_id,
                        time.time() - self._epoch_start)
        super().on_epoch_end(*a, **kw)

    def on_batch_begin(self, *a, **kw):
        self._batch_start = time.time()

    def on_batch_end(self, *a, **kw):
        self.batch_times.append(time.time() - self._batch_start)
        if self.batch_every and self.batch_id % self.batch_every == 0:
            logger.info("batch %d rolling mean time %.4fs", self.batch_id,
                        float(np.mean(self.batch_times)))
        super().on_batch_end(*a, **kw)


class MetricsMonitor(Callback):
    """Channel sender (NeptuneMonitor analog, reference :282-322):
    batch/epoch losses to a MetricSink."""

    def __init__(self, sink: Optional[MetricSink] = None, model_name="unet", **_):
        super().__init__()
        self.sink = sink or MetricSink()
        self.model_name = model_name

    def on_batch_end(self, metrics=None, **kw):
        for name, value in (metrics or {}).items():
            self.sink.send(f"{self.model_name} batch {name}",
                           self.batch_id, float(value))
        super().on_batch_end(**kw)

    def on_epoch_end(self, *a, **kw):
        if self.validation_datagen is not None or self.meta_valid is not None:
            for name, value in self.get_validation_loss().items():
                self.sink.send(f"{self.model_name} epoch_val {name}",
                               self.epoch_id, float(np.asarray(value)))
        super().on_epoch_end(*a, **kw)


class ResumeCheckpoint(Callback):
    """Periodic 'last' checkpoint + resume (failure recovery, SURVEY.md §5:
    the reference could only resume at Step granularity via its transformer
    cache; this restores params+opt state+step mid-run).

    Serializing the full TrainState pulls every parameter off the device
    (~0.5 GB for ResNet34-UNet + Adam state) — at every-epoch cadence that
    dominated epoch wall time on the tunnel-attached chip, so the default
    saves every 5 epochs (config: resume_every)."""

    def __init__(self, checkpoint_dir, epoch_every=5, defer_save=False, **_):
        super().__init__()
        self.checkpoint_dir = checkpoint_dir
        self.epoch_every = epoch_every
        # in the default list this callback runs FIRST (its on_train_begin
        # must publish resume_info before siblings reset) — but saving from
        # first position would snapshot sibling states BEFORE they process
        # this epoch's validation result (one epoch stale). defer_save=True
        # hands the save to a _ResumeSaver placed LAST in the list.
        self.defer_save = defer_save

    @property
    def last_path(self):
        return os.path.join(self.checkpoint_dir, "last.msgpack")

    @property
    def aux_path(self):
        """Epoch schedule + callback states (JSON sidecar next to the
        msgpack): a run killed at epoch k resumes the SCHEDULE at k+1 — it
        does not train `epochs` more — and early-stop/best-checkpoint
        accounting survives the kill."""
        return self.last_path + ".aux.json"

    def on_train_begin(self, *a, **kw):
        # publish resume_info BEFORE super() so even this callback's own
        # epoch counter picks it up; this callback is first in the
        # CallbackList, so every sibling's on_train_begin sees it too
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        if os.path.exists(self.last_path):
            from mapping_tpu.train.checkpoint import load_state

            self.trainer.state = load_state(self.trainer.state, self.last_path)
            info = {}
            if os.path.exists(self.aux_path):
                with open(self.aux_path) as f:
                    aux = json.load(f)
                info = {"next_epoch": int(aux.get("epoch_id", -1)) + 1,
                        "callbacks": aux.get("callbacks", {})}
            self.trainer.resume_info = info
            logger.info(
                "resumed from %s at step %d (next epoch %d)", self.last_path,
                int(np.asarray(self.trainer.state.step)),
                info.get("next_epoch", 0))
        super().on_train_begin(*a, **kw)

    def on_epoch_end(self, *a, **kw):
        if not self.defer_save:
            self.maybe_save(self.epoch_id)
        super().on_epoch_end(*a, **kw)

    def maybe_save(self, epoch_id):
        if not (self.epoch_every and epoch_id % self.epoch_every == 0):
            return
        from mapping_tpu.train.checkpoint import save_state

        save_state(self.trainer.state, self.last_path)
        aux = {"epoch_id": epoch_id}
        callbacks = getattr(self.trainer, "_callbacks", None)
        if callbacks is not None:
            aux["callbacks"] = callbacks.state_dicts()
        tmp = self.aux_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(aux, f)
        os.replace(tmp, self.aux_path)


class _ResumeSaver(Callback):
    """Tail of the default callback list: performs the ResumeCheckpoint
    save AFTER every sibling processed the epoch, so the persisted
    early-stop/best-checkpoint states reflect THIS epoch's validation."""

    def __init__(self, owner: "ResumeCheckpoint"):
        super().__init__()
        self.owner = owner

    def on_epoch_end(self, *a, **kw):
        self.owner.maybe_save(self.epoch_id)
        super().on_epoch_end(*a, **kw)


class ProfilerTrace(Callback):
    """jax.profiler trace of a few training steps (SURVEY.md §5 tracing:
    the reference only had wall-clock ExperimentTiming)."""

    def __init__(self, trace_dir, start_batch=10, n_batches=5, **_):
        super().__init__()
        self.trace_dir = trace_dir
        self.start_batch = start_batch
        self.n_batches = n_batches
        self._active = False
        self._done = False

    def on_batch_begin(self, *a, **kw):
        import jax

        if (not self._done and not self._active
                and self.batch_id == self.start_batch):
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def on_batch_end(self, *a, **kw):
        import jax

        if self._active and self.batch_id >= self.start_batch + self.n_batches:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logger.info("profiler trace written to %s", self.trace_dir)
        super().on_batch_end(**kw)

    def on_train_end(self, *a, **kw):
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class PredictionImageMonitor(Callback):
    """Save up to `image_nr` prediction-vs-GT mask pairs per epoch
    (NeptuneMonitorSegmentation's image channels, src/callbacks.py:33-105 —
    written as PNGs under the experiment dir instead of a neptune channel)."""

    def __init__(self, output_dir, image_nr=4, epoch_every=1, **_):
        super().__init__()
        self.output_dir = output_dir
        self.image_nr = image_nr
        self.epoch_every = epoch_every

    def on_epoch_end(self, *a, **kw):
        if (self.validation_datagen is not None and self.epoch_every
                and self.epoch_id % self.epoch_every == 0):
            self._save_images()
        super().on_epoch_end(*a, **kw)

    def _save_images(self):
        from imageio import imwrite

        flow, steps = self.validation_datagen
        saved = 0
        out_dir = os.path.join(self.output_dir, f"epoch_{self.epoch_id}")
        os.makedirs(out_dir, exist_ok=True)
        for batch in flow:
            if "target" not in batch:
                break
            probs = self.trainer._predict_step(self.trainer.state,
                                               batch["image"])
            pred = np.asarray(probs)[..., -1] > 0.5
            gt = np.asarray(batch["target"])[..., 0] > 0.5
            for i in range(pred.shape[0]):
                if saved >= self.image_nr:
                    return
                pair = np.concatenate([gt[i], pred[i]], axis=1)
                imwrite(os.path.join(out_dir, f"val_{saved}.png"),
                        (pair * 255).astype(np.uint8))
                saved += 1
            break


def default_unet_callbacks(callbacks_config) -> CallbackList:
    """The reference's callbacks_unet list (src/models.py:295-307)."""
    cc = callbacks_config
    validate_with_map = cc.get("validate_with_map", False)
    validation_cls = (ValidationMonitorSegmentation if validate_with_map
                      else ValidationMonitor)
    callbacks = []
    resume_cb = None
    if cc.get("resume", True) and cc.get("checkpoint_dir"):
        # FIRST: its on_train_begin publishes trainer.resume_info which every
        # later callback's on_train_begin consumes; the SAVE runs last (see
        # _ResumeSaver appended below)
        resume_cb = ResumeCheckpoint(
            cc["checkpoint_dir"], epoch_every=cc.get("resume_every", 5),
            defer_save=True)
        callbacks.append(resume_cb)
    callbacks += [
        ExperimentTiming(),
        TrainingMonitor(),
        validation_cls(**cc),
        ModelCheckpoint(cc["checkpoint_dir"], minimize=cc.get("minimize", True),
                        write_every=cc.get("best_write_every", 5)),
        EarlyStopping(patience=cc.get("patience", 30),
                      minimize=cc.get("minimize", True)),
        MetricsMonitor(sink=MetricSink(os.path.join(
            os.path.dirname(os.path.dirname(cc["checkpoint_dir"])),
            "metrics.jsonl")) if cc.get("checkpoint_dir") else None),
    ]
    if cc.get("profile_trace_dir"):
        callbacks.append(ProfilerTrace(cc["profile_trace_dir"]))
    if cc.get("image_monitor_dir"):
        callbacks.append(PredictionImageMonitor(cc["image_monitor_dir"],
                                                image_nr=cc.get("image_nr", 4)))
    if resume_cb is not None:
        callbacks.append(_ResumeSaver(resume_cb))
    return CallbackList(callbacks)
