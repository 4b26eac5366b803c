"""PipelineManager: experiment lifecycle orchestration.

Parity target: reference src/pipeline_manager.py — prepare_masks,
prepare_metadata, train (dev-mode 20/10 sampling), evaluate (val sampling,
chunked prediction, prediction.json, COCO AP/AR), predict_on_dir, plus the
scoring-model data assembly and the CATEGORY_LAYERS guard asserts
(src/pipeline_manager.py:38-61). Neptune experiment tracking becomes the
MetricSink (stdout + metrics.jsonl under the experiment dir).
"""

import json
import math
import os
import shutil
from typing import Optional

import numpy as np
import pandas as pd

from mapping_tpu.config import build_config
from mapping_tpu.constants import (CATEGORY_IDS, CATEGORY_LAYERS, SEED,
                                   X_COLUMNS, Y_COLUMNS_SCORING)
from mapping_tpu.data.metadata import (generate_inference_metadata,
                                       generate_metadata)
from mapping_tpu.eval import coco_evaluation
from mapping_tpu.infer.annotations import labeled_to_annotations
from mapping_tpu.pipelines import PIPELINES
from mapping_tpu.prep import overlay_masks
from mapping_tpu.train.callbacks import MetricSink
from mapping_tpu.utils.logging import get_logger

logger = get_logger()


def _seed_everything(seed):
    import random

    random.seed(seed)
    np.random.seed(seed)


class PipelineManager:
    def __init__(self, config_path: Optional[str] = None, overrides=None):
        self.config = build_config(config_path, overrides)
        self.params = self.config.params
        _seed_everything(SEED)
        self.sink = MetricSink(os.path.join(self.params.experiment_dir,
                                            "metrics.jsonl"))

    def _category_layers(self):
        return list(self.params.get("category_layers", CATEGORY_LAYERS))

    def prepare_masks(self, dev_mode):
        prepare_masks(dev_mode, self.params)

    def prepare_metadata(self, train_data, valid_data):
        prepare_metadata(train_data, valid_data, self.params)

    def start_experiment(self):
        os.makedirs(self.params.experiment_dir, exist_ok=True)

    def finish_experiment(self):
        pass

    def train(self, pipeline_name, dev_mode, warm_start=False):
        cl = self._category_layers()
        if pipeline_name == "scoring_model":
            assert cl[1] > 1, (
                "Train the scoring model with multiple thresholds: set "
                "category_layers to [1, 19]")
        else:
            assert cl[1] == 1, (
                "Training the base unet requires category_layers [1, 1]")
        if (warm_start or self.config.params.get("warm_start", 0)) \
                and self.config.params.get("overwrite", 0):
            raise ValueError(
                "warm_start and overwrite are mutually exclusive: overwrite "
                "deletes the experiment dir (including the previous stage's "
                "weights warm_start would continue from)")
        # scope the flag to THIS call: config.params is shared state, and a
        # later train() on the same manager must not silently warm-start
        # (archiving the checkpoint dir and fitting another stage) because
        # an earlier call asked for it
        prev = self.config.params.get("warm_start", 0)
        if warm_start:
            self.config.params["warm_start"] = 1
        try:
            train(pipeline_name, dev_mode, self.config)
        finally:
            self.config.params["warm_start"] = prev

    def evaluate(self, pipeline_name, dev_mode, chunk_size):
        cl = self._category_layers()
        if "scoring_model" in pipeline_name:
            assert cl[1] > 1, (
                "Evaluating a scoring-model pipeline requires multiple "
                "thresholds: set category_layers to [1, 19]")
        else:
            assert cl[1] == 1, (
                "Evaluating without a second-layer model requires "
                "category_layers [1, 1]")
        ap, ar = evaluate(pipeline_name, dev_mode, chunk_size, self.config)
        self.sink.send_metric("Precision", ap)
        self.sink.send_metric("Recall", ar)
        return ap, ar

    def evaluate_artifact(self, artifact_dir, dev_mode=False,
                          chunk_size=None):
        ap, ar = evaluate_with_artifact(artifact_dir, dev_mode, chunk_size,
                                        self.config)
        self.sink.send_metric("Precision", ap)
        self.sink.send_metric("Recall", ar)
        return ap, ar

    def import_checkpoint(self, path, pipeline_name="unet"):
        """Import a complete reference torch checkpoint into the
        experiment's transformer cache (full-model state_dict for any of
        the six pretrained architectures; the config's `encoder` selects
        the target). After this, `evaluate` scores the reference's trained
        weights directly."""
        # same CATEGORY_LAYERS guard as train/evaluate: a scoring-model
        # configured yaml ([1, 19]) would build a pipeline whose cache
        # mismatches later evaluate runs, surfacing only as a distant
        # shape error — fail at import time instead
        cl = self._category_layers()
        if "scoring_model" in pipeline_name:
            assert cl[1] > 1, (
                "Importing under a scoring-model pipeline requires multiple "
                "thresholds: set category_layers to [1, 19]")
        else:
            assert cl[1] == 1, (
                "Importing a base unet checkpoint requires category_layers "
                "[1, 1] (this yaml sets {})".format(cl))
        pipeline = PIPELINES[pipeline_name]["inference"](self.config)
        base = getattr(pipeline, "base", pipeline)
        base.import_checkpoint(path)

    def predict_on_dir(self, pipeline_name, dir_path, prediction_path,
                       chunk_size):
        cl = self._category_layers()
        if "scoring_model" in pipeline_name:
            assert cl[1] > 1, "set category_layers to [1, 19]"
        else:
            assert cl[1] == 1, "set category_layers to [1, 1]"
        predict_on_dir(pipeline_name, dir_path, prediction_path, chunk_size,
                       self.config)


# ---------------------------------------------------------------------------
# real-data parity drill (VERDICT r4 next #8)
# ---------------------------------------------------------------------------

#: the reference's published stage-1 validation result and the agreed
#: tolerance (reference README.md:21-29; BASELINE.json parity target)
REFERENCE_AP = 0.943
REFERENCE_AR = 0.954
PARITY_TOLERANCE = 0.002


def parity_drill(manager, pipeline_name, checkpoint_path, data_dir=None,
                 chunk_size=None, dev_mode=False):
    """import_checkpoint -> (metadata if missing) -> evaluate -> delta vs
    the reference's published AP 0.943 / AR 0.954. Keeps the real-data
    parity check a single command for the day the CrowdAI dataset and a
    trained reference checkpoint land (both are environment-blocked here;
    the drill itself is rehearsed end-to-end on the synthetic fixture)."""
    if data_dir:
        # the drill only needs data_dir for metadata scan + the GT json;
        # training-side config consumers never run under it
        manager.params["data_dir"] = str(data_dir)
    if not os.path.exists(checkpoint_path):
        raise FileNotFoundError(f"no checkpoint at {checkpoint_path}")
    manager.start_experiment()
    meta_path = os.path.join(manager.params.meta_dir, "metadata.csv")
    if not os.path.exists(meta_path):
        logger.info("parity drill: no metadata.csv; scanning the val split")
        manager.prepare_metadata(train_data=False, valid_data=True)
    manager.import_checkpoint(checkpoint_path, pipeline_name)
    ap, ar = manager.evaluate(pipeline_name, dev_mode=dev_mode,
                              chunk_size=chunk_size)
    report = {
        "pipeline": pipeline_name,
        "checkpoint": str(checkpoint_path),
        "ap": float(ap),
        "ar": float(ar),
        "reference_ap": REFERENCE_AP,
        "reference_ar": REFERENCE_AR,
        "delta_ap": round(float(ap) - REFERENCE_AP, 6),
        "delta_ar": round(float(ar) - REFERENCE_AR, 6),
        "tolerance": PARITY_TOLERANCE,
        "parity": bool(abs(float(ap) - REFERENCE_AP) <= PARITY_TOLERANCE
                       and abs(float(ar) - REFERENCE_AR) <= PARITY_TOLERANCE),
    }
    logger.info("parity drill: AP %.4f (ref %.3f, delta %+.4f)  AR %.4f "
                "(ref %.3f, delta %+.4f)  parity=%s",
                report["ap"], REFERENCE_AP, report["delta_ap"],
                report["ar"], REFERENCE_AR, report["delta_ar"],
                report["parity"])
    return report


# ---------------------------------------------------------------------------
# module-level drivers (reference src/pipeline_manager.py:68-244)
# ---------------------------------------------------------------------------

def prepare_masks(dev_mode, params):
    for dataset in ["train", "val"]:
        mask_dirname = "masks_overlayed_eroded_{}_dilated_{}".format(
            params.erode_selem_size, params.dilate_selem_size)
        target_dir = os.path.join(params.meta_dir, mask_dirname)
        logger.info("overlaying masks for %s -> %s", dataset, target_dir)
        overlay_masks(
            data_dir=params.data_dir,
            dataset=dataset,
            target_dir=target_dir,
            category_ids=CATEGORY_IDS,
            erode=params.erode_selem_size,
            dilate=params.dilate_selem_size,
            is_small=bool(dev_mode),
            border_width=params.border_width,
            small_annotations_size=params.small_annotations_size,
        )


def prepare_metadata(train_data, valid_data, params):
    logger.info("creating metadata")
    meta = generate_metadata(
        data_dir=params.data_dir,
        meta_dir=params.meta_dir,
        masks_overlayed_prefix=params.masks_overlayed_prefix,
        process_train_data=train_data,
        process_validation_data=valid_data,
    )
    path = os.path.join(params.meta_dir, "metadata.csv")
    os.makedirs(params.meta_dir, exist_ok=True)
    meta.to_csv(path, index=None)
    logger.info("metadata saved to %s", path)


def _sample(df, n, seed):
    n = min(int(n), len(df))
    return df.sample(n, random_state=seed) if n < len(df) else df


def train(pipeline_name, dev_mode, config):
    params = config.params
    logger.info("training %s", pipeline_name)
    if bool(params.overwrite) and os.path.isdir(params.experiment_dir):
        shutil.rmtree(params.experiment_dir)

    meta = pd.read_csv(os.path.join(params.meta_dir, "metadata.csv"),
                       low_memory=False)
    meta_train = meta[meta["is_train"] == 1]
    meta_valid = meta[meta["is_valid"] == 1]
    meta_valid = _sample(meta_valid, params.evaluation_data_sample, SEED)

    train_mode = True
    annotations = None
    if dev_mode:
        meta_train = _sample(meta_train, 20, SEED)
        meta_valid = _sample(meta_valid, 10, SEED)
    if pipeline_name == "scoring_model":
        train_mode = False
        meta_train, annotations = _get_scoring_model_data(
            params.data_dir, meta_train,
            params.scoring_model__num_training_examples, SEED)

    data = {
        "input": {
            "meta": meta_train,
            "target_sizes": [(300, 300)] * len(meta_train),
            "annotations": annotations,
        },
        "specs": {"train_mode": train_mode},
        "callback_input": {"meta_valid": meta_valid},
    }
    pipeline = PIPELINES[pipeline_name]["train"](config)
    pipeline.clean_cache()
    pipeline.fit_transform(data)
    pipeline.clean_cache()


def evaluate(pipeline_name, dev_mode, chunk_size, config):
    params = config.params
    logger.info("evaluating %s", pipeline_name)
    meta = pd.read_csv(os.path.join(params.meta_dir, "metadata.csv"),
                       low_memory=False)
    meta_valid = meta[meta["is_valid"] == 1]
    meta_valid = _sample(meta_valid, params.evaluation_data_sample, SEED)
    if dev_mode:
        meta_valid = _sample(meta_valid, 30, SEED)

    pipeline = PIPELINES[pipeline_name]["inference"](config)
    prediction = generate_prediction(meta_valid, pipeline, config, chunk_size)

    prediction_filepath = os.path.join(params.experiment_dir,
                                       "prediction.json")
    os.makedirs(params.experiment_dir, exist_ok=True)
    with open(prediction_filepath, "w") as f:
        json.dump(prediction, f)

    gt_path = os.path.join(params.data_dir, "val", "annotation.json")
    ap, ar = coco_evaluation(
        gt_filepath=gt_path,
        prediction_filepath=prediction_filepath,
        image_ids=list(meta_valid[Y_COLUMNS_SCORING[0]].values),
        category_ids=[c for c in CATEGORY_IDS if c is not None],
        small_annotations_size=params.small_annotations_size,
    )
    logger.info("validation precision (AP@0.5) = %.4f", ap)
    logger.info("validation recall    (AR@0.5) = %.4f", ar)
    return ap, ar


def evaluate_with_artifact(artifact_dir, dev_mode, chunk_size, config):
    """`evaluate --artifact DIR`: the deployment acceptance check — run the
    exported AOT program over the validation sample and score it with the
    same forked-COCOeval protocol `evaluate` uses, so an artifact's AP can
    be compared against the live pipeline's before rollout. Needs the data
    + metadata dirs from the config, but no checkpoint or model code."""
    from mapping_tpu.infer.artifact import (load_artifact,
                                            predict_paths_with_artifact)

    params = config.params
    logger.info("evaluating artifact %s", artifact_dir)
    meta = pd.read_csv(os.path.join(params.meta_dir, "metadata.csv"),
                       low_memory=False)
    meta_valid = meta[meta["is_valid"] == 1]
    meta_valid = _sample(meta_valid, params.evaluation_data_sample, SEED)
    if dev_mode:
        meta_valid = _sample(meta_valid, 30, SEED)

    art = load_artifact(artifact_dir)
    if params.get("data_parallel", 0):
        art.replicate()  # N-replica replay; single-local-device no-op
    prediction = predict_paths_with_artifact(
        art, list(meta_valid[Y_COLUMNS_SCORING[0]].values),
        list(meta_valid[X_COLUMNS[0]].values),
        chunk_images=int(chunk_size or 0))

    prediction_filepath = os.path.join(params.experiment_dir,
                                       "prediction.json")
    os.makedirs(params.experiment_dir, exist_ok=True)
    with open(prediction_filepath, "w") as f:
        json.dump(prediction, f)

    gt_path = os.path.join(params.data_dir, "val", "annotation.json")
    ap, ar = coco_evaluation(
        gt_filepath=gt_path,
        prediction_filepath=prediction_filepath,
        image_ids=list(meta_valid[Y_COLUMNS_SCORING[0]].values),
        category_ids=[c for c in CATEGORY_IDS if c is not None],
        small_annotations_size=params.small_annotations_size,
    )
    logger.info("artifact validation precision (AP@0.5) = %.4f", ap)
    logger.info("artifact validation recall    (AR@0.5) = %.4f", ar)
    return ap, ar


def predict_on_dir(pipeline_name, dir_path, prediction_path, chunk_size,
                   config):
    meta = generate_inference_metadata(images_dir=dir_path)
    pipeline = PIPELINES[pipeline_name]["inference"](config)
    prediction = generate_prediction(meta, pipeline, config, chunk_size)
    with open(prediction_path, "w") as f:
        json.dump(prediction, f)
    logger.info("submission saved to %s", prediction_path)


def generate_prediction(meta_data, pipeline, config, chunk_size=None):
    category_layers = tuple(config.params.get("category_layers",
                                              CATEGORY_LAYERS))
    # scoring pipelines mark NMS-suppressed instances with score 0 instead
    # of removing them (reference parity); by default the writer drops them
    # (`emit_suppressed: 0`) — the eval protocol ranks by score and caps at
    # maxDets=100, and a ~25x smaller prediction.json scores identically.
    # Non-scoring pipelines never zero a score, so they always emit all.
    emit_suppressed = (not hasattr(pipeline, "nms")
                       or bool(config.params.get("emit_suppressed", 0)))
    # scoring pipelines force stream mode like the reference did
    # (src/pipelines.py:309): their 19-layer label maps + feature tensors
    # for a default 1000-image evaluate would hold ~GBs if materialized
    stream = (config.params.get("stream_mode", 0)
              or getattr(pipeline, "force_stream", False))
    if chunk_size is None and stream:
        # stream mode: per-image generator through the WHOLE chain (the
        # reference's generator-transformer path, src/utils.py:392-413);
        # only one postprocessed batch is live at a time
        if hasattr(pipeline, "transform_stream"):
            data = {
                "input": {"meta": meta_data,
                          "target_sizes": [(300, 300)] * len(meta_data)},
                "specs": {"train_mode": False},
                "callback_input": {"meta_valid": None},
            }
            prediction = []
            stream = pipeline.transform_stream(data)["y_pred"]
            for image_id, (labels, scores) in zip(
                    meta_data["ImageId"].values, stream):
                prediction.extend(labeled_to_annotations(
                    image_id, np.asarray(labels), scores, CATEGORY_IDS,
                    category_layers, emit_suppressed=emit_suppressed))
            return prediction
        # pipelines without a stream path fall back to batch-sized chunks
        chunk_size = int(config.params.batch_size_inference)
    if chunk_size is None:
        chunks = [meta_data]
    else:
        n = math.ceil(len(meta_data) / chunk_size)
        chunks = [meta_data.iloc[i * chunk_size:(i + 1) * chunk_size]
                  for i in range(n)]
    prediction = []
    for chunk in chunks:
        data = {
            "input": {"meta": chunk,
                      "target_sizes": [(300, 300)] * len(chunk)},
            "specs": {"train_mode": False},
            "callback_input": {"meta_valid": None},
        }
        pipeline.clean_cache()
        y_pred = pipeline.transform(data)["y_pred"]
        pipeline.clean_cache()
        for image_id, (labels, scores) in zip(chunk["ImageId"].values, y_pred):
            prediction.extend(labeled_to_annotations(
                image_id, np.asarray(labels), scores, CATEGORY_IDS,
                category_layers, emit_suppressed=emit_suppressed))
    return prediction


def _get_scoring_model_data(data_dir, meta, num_training_examples, seed):
    """Sample rows + group annotations per image/category (reference
    src/pipeline_manager.py:232-244)."""
    from mapping_tpu.data.coco import COCOIndex

    coco = COCOIndex(os.path.join(data_dir, "train", "annotation.json"))
    meta = _sample(meta, num_training_examples, seed)
    annotations = []
    for image_id in meta["ImageId"].values:
        image_annotations = {}
        for category_id in CATEGORY_IDS:
            if category_id is None:
                image_annotations[category_id] = []
                continue
            ann_ids = coco.get_ann_ids(img_ids=[image_id],
                                       cat_ids=[category_id])
            image_annotations[category_id] = coco.load_anns(ann_ids)
        annotations.append(image_annotations)
    return meta, annotations
