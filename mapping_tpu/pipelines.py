"""Pipeline registry: the 8 named train/inference pipelines.

Parity target: the reference PIPELINES dict (src/pipelines.py:395-411) —
unet, unet_weighted, unet_tta, unet_padded, scoring_model,
unet_scoring_model, unet_padded_scoring_model, unet_tta_scoring_model —
each mapping 'train'/'inference' to a `config -> pipeline` factory.

Architecture change (SURVEY.md §7 design stance): instead of a lazy host DAG
shuttling per-image numpy between Step nodes, a pipeline here is a thin
composition object around three compiled programs — the loader's device
preprocess, the trainer's train/predict steps, and the fused postprocess —
plus an artifact store replacing the Step transformer cache
(src/steps/base.py:92-174): trained components persist under
`{experiment_dir}/transformers/` and `transform()` refuses to run without
them, like the reference's trainable-step contract.

Prediction format: `y_pred` is a list over images of
(labels (L, 300, 300) int32, scores: per-layer score lists) — the analog of
the reference's images_with_scores.
"""

import os
from functools import partial

from mapping_tpu.constants import (CATEGORY_IDS, CATEGORY_LAYERS, SEED,
                                   X_COLUMNS, Y_COLUMNS)
from mapping_tpu.data.loader import SegmentationLoader
from mapping_tpu.data.tta import tta_specs
from mapping_tpu.infer.postprocess import active_layers_for
from mapping_tpu.scoring import (NonMaximumSupression, ScoringGBM,
                                 ScoringRandomForest, features_from_tensor)
from mapping_tpu.train.trainer import UNetTrainer
from mapping_tpu.utils.logging import get_logger

logger = get_logger()


def _xy(meta):
    x = meta[X_COLUMNS[0]].values
    y_col = Y_COLUMNS[0]
    y = meta[y_col].values if y_col in meta.columns else None
    return x, y


def _category_layers(config):
    return tuple(config.params.get("category_layers", CATEGORY_LAYERS))


class UNetPipeline:
    """unet / unet_weighted / unet_tta / unet_padded, one class.

    (reference factories: src/pipelines.py:12-95,55-91,94-155.)
    """

    def __init__(self, config, train_mode: bool, loss_name: str = "ce",
                 tta: bool = False, padded: bool = False):
        self.config = config
        self.train_mode = train_mode
        self.loss_name = loss_name
        self.tta = tta
        self.padded = padded
        self.cache_dir = config.env.cache_dirpath

        loader_cfg = dict(config.loader)
        if padded:
            loader_cfg["mode"] = "crop_and_pad"
        self.loader = SegmentationLoader(**loader_cfg)
        # predictions from padded inputs get center-cropped back: always for
        # unet_padded, and for unet_tta when the loader pads (the reference's
        # prediction_crop step, src/pipelines.py:65-80,113-125)
        self.crop_predictions = padded or (
            tta and loader_cfg["mode"] == "crop_and_pad")
        self._serve_cache = {}
        self.trainer = UNetTrainer(
            model_params=config.unet.model_params,
            optimizer_params=config.unet.optimizer_params,
            loss_params=config.unet.loss,
            training_config=config.unet.training,
            callbacks_config=config.unet.callbacks if train_mode else None,
            loss_name=loss_name,
            input_size=config.loader.size,
            seed=SEED,
            mesh="auto" if config.params.get("data_parallel", 0) else None,
            remat=bool(config.params.get("remat", 0)),
            pretrained_weights=config.unet.get("pretrained_weights", ""),
        )
        self.category_layers = _category_layers(config)

    # ------------------------------------------------------------ cache
    @property
    def trainer_cache_path(self):
        return os.path.join(self.cache_dir, "transformers", "unet.msgpack")

    def clean_cache(self):
        pass  # no in-RAM step outputs to drop; kept for API parity

    # ------------------------------------------------------------- fit
    def fit_transform(self, data):
        meta = data["input"]["meta"]
        meta_valid = data.get("callback_input", {}).get("meta_valid")
        x, y = _xy(meta)
        x_valid = y_valid = None
        if meta_valid is not None and len(meta_valid):
            x_valid, y_valid = _xy(meta_valid)

        cached = os.path.exists(self.trainer_cache_path)
        warm = bool(self.config.params.get("warm_start", 0))
        if cached and not self.config.params.get("overwrite", 0) and not warm:
            logger.info("unet: loading cached transformer from %s",
                        self.trainer_cache_path)
            self.trainer.load(self.trainer_cache_path)
        else:
            if cached and warm:
                self._begin_stage()
            gens = self.loader.transform(x, y, x_valid, y_valid,
                                         train_mode=True)
            self.trainer.fit(gens["datagen"], gens["validation_datagen"],
                             meta_valid=meta_valid)
            self.trainer.save(self.trainer_cache_path)
            self._mark_stage_complete()
        # the reference's fit_transform then ran inference+postprocessing
        # over the WHOLE training set only to discard it
        # (src/pipeline_manager.py:134-137 ignores the output); skip that.
        return {"y_pred": []}

    # --------------------------------------------------------- import
    def import_checkpoint(self, path):
        """Product surface for the reference's deliverable checkpoints
        (VERDICT r3 next #2): convert a complete torch UNet state_dict
        (plain / {'state_dict': ...} / 'module.'-prefixed — reference
        src/steps/pytorch/utils.py:67-75) into the TrainState and write the
        transformer cache, so evaluate/predict_on_dir/serve/export run the
        imported weights with no further steps."""
        self.trainer.import_torch_checkpoint(path)
        self.trainer.save(self.trainer_cache_path)
        self._mark_stage_complete()
        self._weights_loaded = True  # the live state IS the cache
        logger.info("checkpoint imported -> %s", self.trainer_cache_path)
        return self

    # --------------------------------------------------- multistage train
    @property
    def _checkpoint_dir(self):
        return self.config.unet.get("callbacks", {}).get("checkpoint_dir")

    @property
    def _stage_marker(self):
        ck = self._checkpoint_dir
        return os.path.join(ck, "STAGE_COMPLETE") if ck else None

    def _mark_stage_complete(self):
        """Completed-fit marker in the checkpoint dir: distinguishes a
        finished stage (archive on the next warm start) from a killed one
        (leave in place so its resume sidecar continues the schedule)."""
        marker = self._stage_marker
        if marker:
            os.makedirs(os.path.dirname(marker), exist_ok=True)
            with open(marker, "w") as f:
                f.write("stage complete\n")

    def _begin_stage(self):
        """`warm_start: 1` with an existing transformer cache: execute the
        next stage of the reference's published multistage recipe
        (README.md:86-91 — re-run train with new lr/dice_mask/epochs from
        the previous stage's weights). The COMPLETED previous stage is
        archived, never destroyed: its checkpoint dir moves to
        `<checkpoint_dir>.stage{N}` and its weights copy to
        `unet.stage{N}.msgpack` next to the cache. The new stage starts a
        fresh epoch schedule, fresh optimizer state and FRESH best-
        checkpoint/early-stop tracking (stage hyperparameters change the
        loss surface, so cross-stage best-val comparison is meaningless).
        A stage that was killed mid-run (resume sidecar present, no
        STAGE_COMPLETE marker, stage archives present) is NOT archived —
        rerunning the same command resumes its schedule. A checkpoint dir
        with NO marker and NO archives is a stage completed before the
        marker existed (legacy experiments): archived like a marked one."""
        import shutil

        ck = self._checkpoint_dir
        marker = self._stage_marker
        stem = self.trainer_cache_path[: -len(".msgpack")]
        completed = bool(ck and marker and os.path.exists(marker))
        if ck and not completed:
            # Legacy boundary: experiments that completed a train BEFORE the
            # STAGE_COMPLETE marker existed hold that stage's checkpoint dir
            # (and usually its resume sidecar) but no marker. Left in place,
            # the stale sidecar would overwrite the warm-started state in
            # ResumeCheckpoint.on_train_begin and resume a schedule that is
            # already past its end — the new stage would silently train zero
            # epochs. A killed warm-started stage always has archived
            # predecessors (archiving happens before fitting), and a killed
            # FIRST stage never reaches here (the transformer cache is only
            # written by a completed fit), so checkpoint-dir-without-archives
            # can only be a completed pre-marker stage: archive it.
            has_archives = (os.path.isdir(f"{ck}.stage1")
                            or os.path.exists(f"{stem}.stage1.msgpack"))
            if os.path.isdir(ck) and not has_archives:
                # ... unless a resume sidecar is present: a user who manually
                # removed the stage archives after a killed warm-start run
                # would otherwise have the IN-PROGRESS checkpoints (including
                # the sidecar) archived and the stage silently restarted —
                # and NOT archiving is no better (the stale sidecar would
                # resume a past-end schedule and train zero epochs). The two
                # cases are indistinguishable from disk state, so refuse and
                # make the user disambiguate.
                sidecar = os.path.join(ck, "last.msgpack")
                if os.path.exists(sidecar):
                    raise RuntimeError(
                        "warm start: checkpoint dir {} has no STAGE_COMPLETE "
                        "marker and no stage archives, but a resume sidecar "
                        "(last.msgpack) is present — this is either a stage "
                        "completed before stage markers existed, or a killed "
                        "warm-start stage whose archives were removed. If "
                        "the previous stage finished, delete last.msgpack* "
                        "from the checkpoint dir and re-run; if it was "
                        "killed mid-run, re-run the SAME train command "
                        "without --warm_start to resume it first.".format(ck))
                completed = True
                logger.warning(
                    "warm start: checkpoint dir has no STAGE_COMPLETE marker "
                    "and no stage archives (pre-marker experiment); treating "
                    "the previous stage as completed and archiving it")
        if completed:
            n = 1
            while (os.path.isdir(f"{ck}.stage{n}")
                   or os.path.exists(f"{stem}.stage{n}.msgpack")):
                n += 1
            shutil.move(ck, f"{ck}.stage{n}")
            shutil.copy2(self.trainer_cache_path, f"{stem}.stage{n}.msgpack")
            logger.info("warm start: archived completed stage "
                        "(checkpoints -> %s.stage%d, weights -> "
                        "%s.stage%d.msgpack)", ck, n, stem, n)
        self.trainer.warm_start(self.trainer_cache_path)

    # -------------------------------------------------------- inference
    def transform(self, data, return_features=False):
        """y_pred per image.

        return_features: also emit the per-image (L, max_instances, 9)
        device-computed scoring feature tensor (consumed by the scoring
        pipelines; no probability maps leave the device —
        ops.instance.instance_feature_tensor replaces the reference's
        per-instance host loop, src/postprocessing.py:261-303).
        """
        y_pred = []
        y_feats = []
        for pred, feats in self._postprocessed_images(
                data, return_features=return_features):
            y_pred.append(pred)
            if return_features:
                y_feats.append(feats)
        out = {"y_pred": y_pred}
        if return_features:
            out["features_tensor"] = y_feats
        return out

    def serve_program(self, return_features=False):
        """The fused forward(+TTA)+postprocess program this pipeline serves
        with — ONE device dispatch per batch; only labels/scores/areas (and
        optionally the feature tensor) ever leave the device. Routed through
        the mesh (shard_map over 'data') when `data_parallel: 1`, and through
        GSPMD height-sharding when `spatial_serving: 1`.
        """
        key = bool(return_features)
        if key in self._serve_cache:
            return self._serve_cache[key]
        from mapping_tpu.infer.serving import FusedServe

        post = self.config.postprocessor
        if self.config.params.get("quantized_serving", 0):
            probs_fn, get_params = self._quantized_fns()
        else:
            probs_fn, get_params = self.trainer.probs_apply_fn()
        specs = (tta_specs(**dict(self.config.tta_generator))
                 if self.tta else None)
        spatial = bool(self.config.params.get("spatial_serving", 0))
        # spatial serving is an INFERENCE-only mesh: built here, never handed
        # to the trainer (giving the trainer a mesh would silently shard
        # training batches the user didn't ask to shard)
        mesh = self.trainer.mesh
        if spatial and mesh is None:
            import jax

            from mapping_tpu.parallel import make_mesh

            if len(jax.devices()) < 2:
                raise ValueError(
                    "spatial_serving: 1 needs more than one device")
            mesh = make_mesh()
        serve = FusedServe(
            probs_fn, get_params,
            target_size=tuple(post.target_size),
            category_layers=self.category_layers,
            active_layers=active_layers_for(CATEGORY_IDS,
                                            self.category_layers),
            erode_size=int(post.erode_selem_size),
            dilate_size=int(post.dilate_selem_size),
            crop_size=(tuple(post.target_size) if self.crop_predictions
                       else None),
            tta_specs=specs,
            tta_method=self.config.tta_aggregator.method,
            compute_features=return_features,
            mesh=mesh,
            spatial=spatial,
        )
        self._serve_cache[key] = serve
        return serve

    def _quantized_fns(self):
        """int8 PTQ serving fns (`quantized_serving: 1`): quantize the
        serving model's convs (models/quantize.py) with activation scales
        calibrated on the first `quant_calib_images` metadata images. Falls
        back to float (with a warning) when no metadata exists to calibrate
        on — e.g. a bare predict_on_dir before prepare_metadata."""
        calib = self._calibration_images()
        if calib is None:
            logger.warning("quantized_serving: no metadata to calibrate on; "
                           "serving float")
            return self.trainer.probs_apply_fn()
        from mapping_tpu.models.quantize import quantized_probs_fn

        model, get_p, has_bs = self.trainer.serving_model_fns()

        def version():
            # (version, step) identifies the current weights — the same key
            # the folded-BN cache uses (train/trainer.py _refresh_fold_params)
            return (self.trainer._state_version, self.trainer.step_int())

        return quantized_probs_fn(
            model, get_p, calib, has_batch_stats=has_bs,
            calib_batch_size=int(self.config.params.batch_size_inference),
            version_fn=version)

    def _calibration_images(self):
        """First n preprocessed inference images from the experiment's
        metadata table (device arrays, exactly what the serve program
        sees). None when the metadata csv doesn't exist yet."""
        import numpy as _np
        import pandas as pd

        meta_path = os.path.join(self.config.params.meta_dir, "metadata.csv")
        if not os.path.exists(meta_path):
            return None
        n = int(self.config.params.get("quant_calib_images", 32))
        meta = pd.read_csv(meta_path).iloc[:max(n, 1)]
        x, _ = _xy(meta)
        gens = self.loader.transform(x, None, train_mode=False)
        flow, steps = gens["datagen"]
        chunks, total = [], 0
        for batch_id, batch in enumerate(flow):
            images = batch["image"] if isinstance(batch, dict) else batch
            chunks.append(_np.asarray(images))
            total += images.shape[0]
            if total >= n or batch_id + 1 >= steps:
                break
        return _np.concatenate(chunks)[:n]

    def _postprocessed_images(self, data, return_features=False):
        """Shared batch->per-image generator behind transform (list),
        transform_stream (lazy) and the streaming scoring-model fit: yields
        ((labels, trimmed_scores), feature_tensor|None) one image at a time;
        peak live memory is one postprocessed batch."""
        if not os.path.exists(self.trainer_cache_path):
            raise RuntimeError(
                f"no trained unet found at {self.trainer_cache_path}; run "
                "train first (trainable-transformer contract, reference "
                "src/steps/base.py:166-174)")
        # chunked prediction calls transform per chunk; load the (large)
        # checkpoint once per pipeline instance
        if not getattr(self, "_weights_loaded", False):
            self.trainer.load(self.trainer_cache_path)
            self._weights_loaded = True

        meta = data["input"]["meta"]
        x, _ = _xy(meta)
        gens = self.loader.transform(x, None, train_mode=False)
        flow, steps = gens["datagen"]
        # the loader pads the ragged tail batch with duplicate images (one
        # compiled program per batch shape); emit only the real images
        n_images = getattr(flow, "n_images", None)
        serve = self.serve_program(return_features)
        emitted = 0

        def rows(outs):
            nonlocal emitted
            labels_b, scores_b = outs[0], outs[1]
            feats_b = outs[3] if return_features else None
            for i in range(labels_b.shape[0]):
                if n_images is not None and emitted >= n_images:
                    return
                emitted += 1
                lab, sc = labels_b[i], scores_b[i]
                trimmed = [list(sc[l][: int(lab[l].max())])
                           for l in range(lab.shape[0])]
                yield ((lab, trimmed),
                       feats_b[i] if return_features else None)

        # one batch in flight: dispatch k+1 (async) BEFORE collecting k, so
        # the chip computes batch k+1 while the host decodes the next batch
        # and pulls/handles batch k's labels
        pending = None
        for batch_id, batch in enumerate(flow):
            images = batch["image"] if isinstance(batch, dict) else batch
            handle = serve.dispatch(images)
            if pending is not None:
                yield from rows(serve.collect(pending))
                if n_images is not None and emitted >= n_images:
                    return
            pending = handle
            if batch_id + 1 >= steps:
                break
        if pending is not None:
            yield from rows(serve.collect(pending))

    def transform_stream(self, data):
        """True streaming inference: {'y_pred': <per-image generator>}.

        The reference's stream mode yields per-image results through the
        whole postprocessing chain (make_apply_transformer_stream
        src/utils.py:392-413, PyTorchUNetStream src/models.py:123-146) so
        huge datasets never materialize all predictions. Here the loader and
        the fused serve program advance one batch at a time and images are
        yielded singly — peak memory is one postprocessed batch.
        """
        return {"y_pred": (pred for pred, _ in
                           self._postprocessed_images(data))}


class ScoringModelPipeline:
    """scoring_model train path (reference src/pipelines.py:307-338):
    unet inference -> per-instance features with GT IoU -> fit regressor."""

    def __init__(self, config):
        self.config = config
        self.cache_dir = config.env.cache_dirpath
        self.base = UNetPipeline(config, train_mode=False)
        self.model = _make_scoring_model(config)
        self.category_layers = _category_layers(config)

    @property
    def cache_path(self):
        return os.path.join(self.cache_dir, "transformers",
                            "scoring_model.joblib")

    def clean_cache(self):
        pass

    def fit_transform(self, data):
        # annotations: list aligned with meta rows, each {category_id: [ann]}
        # (reference _get_scoring_model_data, src/pipeline_manager.py:232-244)
        annotations = data["input"].get("annotations")
        meta = data["input"]["meta"]
        if annotations is None:
            annotations = [{}] * len(meta)
        # STREAMING fit: the reference forces stream mode on this pipeline
        # precisely so the whole prediction set is never materialized
        # (src/pipelines.py:309, src/utils.py:392-413). Images flow through
        # the per-image generator and each image's feature tables compact to
        # numpy inside fit_stream — neither the label maps (~70 GB at the
        # default 10k sample) nor the 19-layers-per-image DataFrames
        # (~2 GB of pandas overhead) are ever all live.
        self.model.fit_stream(
            features_from_tensor(feats, labels, anns,
                                 category_layers=self.category_layers)
            for ((labels, _), feats), anns in zip(
                self.base._postprocessed_images(data, return_features=True),
                annotations))
        os.makedirs(os.path.dirname(self.cache_path), exist_ok=True)
        self.model.save(self.cache_path)
        return {"scoring_model": self.model}

    def transform(self, data):
        raise RuntimeError("scoring_model pipeline only supports training")


class ScoringInferencePipeline:
    """unet[_padded|_tta]_scoring_model (reference src/pipelines.py:341-392):
    base inference -> features -> regressor scores -> threshold-layer NMS.

    force_stream: the reference FORCED stream mode on scoring pipelines
    (src/pipelines.py:309) because the 19-threshold-layer label maps for a
    default 1000-image evaluate are ~3.6 GB if materialized; the manager's
    generate_prediction honors the flag the same way."""

    force_stream = True

    def __init__(self, config, base_factory):
        self.config = config
        self.cache_dir = config.env.cache_dirpath
        self.base = base_factory(config)
        self.model = _make_scoring_model(config)
        self.category_layers = _category_layers(config)
        self.nms = NonMaximumSupression(
            iou_threshold=config.postprocessor.nms.iou_threshold)

    @property
    def cache_path(self):
        return os.path.join(self.cache_dir, "transformers",
                            "scoring_model.joblib")

    def clean_cache(self):
        pass

    def _load_model(self):
        if not os.path.exists(self.cache_path):
            raise RuntimeError(
                f"no trained scoring model at {self.cache_path}")
        self.model.load(self.cache_path)

    def _score_one(self, labels, feats):
        """features -> GBM predicted-IoU scores -> cross-layer NMS, for ONE
        image. NMS is per-image in both the reference and the batch path
        (remove_overlapping_masks never looks across images), so scoring
        image-at-a-time is exactly the batch computation, streamed."""
        features = features_from_tensor(feats, labels,
                                        category_layers=self.category_layers)
        image_scores = self.model.transform([features])["scores"][0]
        (labels, image_scores), = self.nms.transform(
            [(labels, image_scores)])["images_with_scores"]
        return labels, image_scores

    def transform(self, data):
        self._load_model()
        out = {"y_pred": []}
        for pred, feats in self.base._postprocessed_images(
                data, return_features=True):
            labels, _ = pred
            out["y_pred"].append(self._score_one(labels, feats))
        return out

    def transform_stream(self, data):
        """True streaming scoring inference (VERDICT r4 next #2): walk the
        base pipeline's per-image generator — features -> GBM score -> NMS
        -> yield — like the scoring TRAIN path (ScoringModelPipeline.
        fit_transform); peak live memory is one postprocessed batch, never
        the whole sample's label maps + feature tensors."""
        self._load_model()
        return {"y_pred": (
            self._score_one(pred[0], feats)
            for pred, feats in self.base._postprocessed_images(
                data, return_features=True))}

    def fit_transform(self, data):
        return self.transform(data)


def _make_scoring_model(config):
    post = config.postprocessor
    if post.scoring_model == "lgbm":
        cfg = post.lightGBM
        return ScoringGBM(model_params=dict(cfg.model_params),
                          training_params=dict(cfg.training_params),
                          train_size=cfg.train_size, target=cfg.target)
    cfg = post.random_forest
    return ScoringRandomForest(model_params=dict(cfg.model_params),
                               train_size=cfg.train_size, target=cfg.target)


PIPELINES = {
    "unet": {
        "train": partial(UNetPipeline, train_mode=True, loss_name="ce"),
        "inference": partial(UNetPipeline, train_mode=False, loss_name="ce"),
    },
    "unet_weighted": {
        "train": partial(UNetPipeline, train_mode=True, loss_name="weighted"),
        "inference": partial(UNetPipeline, train_mode=False,
                             loss_name="weighted"),
    },
    "unet_tta": {
        "inference": partial(UNetPipeline, train_mode=False, tta=True),
    },
    "unet_padded": {
        "inference": partial(UNetPipeline, train_mode=False, padded=True),
    },
    "scoring_model": {"train": ScoringModelPipeline},
    "unet_scoring_model": {
        "inference": partial(
            ScoringInferencePipeline,
            base_factory=partial(UNetPipeline, train_mode=False)),
    },
    "unet_padded_scoring_model": {
        "inference": partial(
            ScoringInferencePipeline,
            base_factory=partial(UNetPipeline, train_mode=False, padded=True)),
    },
    "unet_tta_scoring_model": {
        "inference": partial(
            ScoringInferencePipeline,
            base_factory=partial(UNetPipeline, train_mode=False, tta=True)),
    },
}
