"""Scoring-model pipelines end-to-end on the synthetic fixture:
train scoring_model (category_layers [1, 19]) then unet_scoring_model
inference with NMS (reference flow, src/pipelines.py:307-392)."""

import os

import numpy as np
import pytest
import yaml

from tests.fixtures.synthetic import generate

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("scoring_e2e")
    data_dir = os.path.join(str(root), "data")
    generate(data_dir, n_train=6, n_val=3, seed=33)
    params = {
        "data_dir": data_dir,
        "meta_dir": os.path.join(str(root), "meta"),
        "experiment_dir": os.path.join(str(root), "experiment"),
        "encoder": "from_scratch",
        "n_filters": 8,
        "repeat_blocks": 2,
        "image_h": 64,
        "image_w": 64,
        "batch_size_train": 3,
        "batch_size_inference": 3,
        "epochs_nr": 8,
        "lr": 0.003,
        "patience": 100,
        "validate_with_map": 1,
        "evaluation_data_sample": 3,
        "scoring_model__num_training_examples": 6,
        "lgbm__number_of_trees": 50,
    }
    config_path = os.path.join(str(root), "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"parameters": params}, f)
    return {"root": str(root), "config": config_path}


def test_scoring_model_cycle(workspace):
    from mapping_tpu.manager import PipelineManager

    # 1) prepare + train the base unet with [1, 1]
    manager = PipelineManager(workspace["config"])
    manager.prepare_masks(dev_mode=False)
    manager.prepare_metadata(train_data=True, valid_data=True)
    manager.train("unet", dev_mode=False)

    # 2) guard asserts: scoring needs [1, 19], base needs [1, 1]
    with pytest.raises(AssertionError):
        manager.train("scoring_model", dev_mode=False)
    manager_19 = PipelineManager(workspace["config"],
                                 overrides={"category_layers": [1, 19]})
    with pytest.raises(AssertionError):
        manager_19.train("unet", dev_mode=False)

    # 3) train the scoring model over 19 threshold layers
    manager_19.train("scoring_model", dev_mode=False)
    assert os.path.exists(os.path.join(
        manager_19.params.experiment_dir, "transformers",
        "scoring_model.joblib"))

    # 4) evaluate through the scoring pipeline (features -> predicted IoU ->
    #    NMS across threshold layers)
    ap, ar = manager_19.evaluate("unet_scoring_model", dev_mode=False,
                                 chunk_size=None)
    assert np.isfinite(ap) and np.isfinite(ar)
    assert ap > 0.2, f"scoring-pipeline AP too low: {ap}"


def test_scoring_inference_streams_by_default(workspace):
    """VERDICT r4 next #2: a default `evaluate -p unet_scoring_model`
    (chunk_size None, stream_mode 0) must go through transform_stream —
    the reference forced stream mode on scoring pipelines precisely so the
    whole sample's label maps are never materialized (src/pipelines.py:309)
    — and produce byte-identical annotations to the batch transform."""
    import json

    import pandas as pd

    import mapping_tpu.pipelines as pl
    from mapping_tpu.manager import PipelineManager, generate_prediction

    manager = PipelineManager(workspace["config"],
                              overrides={"category_layers": [1, 19]})
    meta = pd.read_csv(os.path.join(manager.params.meta_dir, "metadata.csv"))
    meta_val = meta[meta["is_valid"] == 1]

    # batch path (explicit chunking) as the oracle
    pipeline_b = pl.PIPELINES["unet_scoring_model"]["inference"](
        manager.config)
    pred_batch = generate_prediction(meta_val, pipeline_b, manager.config,
                                     chunk_size=1000)

    # default path must stream: batch transform forbidden
    pipeline_s = pl.PIPELINES["unet_scoring_model"]["inference"](
        manager.config)
    assert pipeline_s.force_stream

    def boom(data):
        raise AssertionError("batch transform called on the default "
                             "scoring evaluate path")

    pipeline_s.transform = boom
    pred_stream = generate_prediction(meta_val, pipeline_s, manager.config,
                                      chunk_size=None)
    assert json.dumps(pred_stream) == json.dumps(pred_batch)


def test_emit_suppressed_default_shrinks_json_same_ap(workspace):
    """VERDICT r4 next #7: the default writer-side drop of NMS-suppressed
    (score==0) instances must leave AP/AR bit-identical — the eval protocol
    ranks by score and caps at maxDets, and a suppressed instance never
    outranks the survivor that suppressed it — while shrinking the
    scoring prediction.json (the 19-layer path carries ~1.5k junk
    rows/image when emitted)."""
    import json

    from mapping_tpu.manager import PipelineManager

    manager_drop = PipelineManager(workspace["config"],
                                   overrides={"category_layers": [1, 19]})
    ap_d, ar_d = manager_drop.evaluate("unet_scoring_model", dev_mode=False,
                                       chunk_size=None)
    pred_path = os.path.join(manager_drop.params.experiment_dir,
                             "prediction.json")
    with open(pred_path) as f:
        pred_dropped = json.load(f)
    size_dropped = os.path.getsize(pred_path)

    manager_emit = PipelineManager(workspace["config"],
                                   overrides={"category_layers": [1, 19],
                                              "emit_suppressed": 1})
    ap_e, ar_e = manager_emit.evaluate("unet_scoring_model", dev_mode=False,
                                       chunk_size=None)
    with open(pred_path) as f:
        pred_emitted = json.load(f)
    size_emitted = os.path.getsize(pred_path)

    assert ap_d == ap_e and ar_d == ar_e, (ap_d, ap_e, ar_d, ar_e)
    assert all(a["score"] != 0.0 for a in pred_dropped)
    n_suppressed = sum(1 for a in pred_emitted if a["score"] == 0.0)
    assert n_suppressed > 0  # the fixture's 19-layer NMS does suppress
    assert len(pred_emitted) == len(pred_dropped) + n_suppressed
    assert size_dropped < size_emitted
    # and the emitted-vs-dropped survivors are the SAME annotations
    kept = [a for a in pred_emitted if a["score"] != 0.0]
    assert json.dumps(kept, sort_keys=True) == json.dumps(
        pred_dropped, sort_keys=True)


def test_scoring_transform_stream_is_lazy(workspace):
    """The scoring stream must not postprocess/score ahead of consumption:
    after pulling ONE image, at most one batch went through the fused
    serve (same laziness contract as the base pipeline's stream)."""
    import pandas as pd

    import mapping_tpu.pipelines as pl
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"category_layers": [1, 19],
                                         "batch_size_inference": 1})
    meta = pd.read_csv(os.path.join(manager.params.meta_dir, "metadata.csv"))
    meta_val = meta[meta["is_valid"] == 1]
    assert len(meta_val) >= 2

    pipeline = pl.PIPELINES["unet_scoring_model"]["inference"](manager.config)
    serve = pipeline.base.serve_program(return_features=True)
    calls = {"n": 0}

    class Counting:
        def dispatch(self, images):
            return serve.dispatch(images)

        def collect(self, handle):
            calls["n"] += 1
            return serve.collect(handle)

    pipeline.base._serve_cache[True] = Counting()
    data = {
        "input": {"meta": meta_val,
                  "target_sizes": [(300, 300)] * len(meta_val)},
        "specs": {"train_mode": False},
        "callback_input": {"meta_valid": None},
    }
    stream = pipeline.transform_stream(data)["y_pred"]
    assert calls["n"] == 0
    next(stream)
    assert calls["n"] == 1  # exactly one batch served and scored


def test_serving_daemon_scoring_pipeline(workspace):
    """Online serving of the best-quality configuration: the daemon built
    from `unet_scoring_model` runs FusedServe-with-features on device and
    per-image GBM IoU rescoring + cross-layer NMS on host, returning the
    rescored annotations (batch evaluate path: pipelines.py
    ScoringInferencePipeline.transform)."""
    import glob
    import json
    import urllib.request

    import mapping_tpu.pipelines as pl
    from mapping_tpu.infer.daemon import daemon_from_pipeline
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"category_layers": [1, 19]})
    pipeline = pl.PIPELINES["unet_scoring_model"]["inference"](manager.config)
    daemon = daemon_from_pipeline(pipeline, manager.config, port=0,
                                  max_wait_ms=1.0)
    daemon.start_background()
    try:
        img_path = sorted(glob.glob(os.path.join(
            manager.params.data_dir, "val", "images", "*")))[0]
        with open(img_path, "rb") as f:
            body = f.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{daemon.port}/v1/predict", data=body,
            headers={"Content-Type": "image/jpeg", "X-Image-Id": "2"})
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{daemon.port}/v1/health", timeout=60).read())
    finally:
        daemon.shutdown()
    assert health["scoring_model"] is True
    anns = payload["annotations"]
    assert anns and anns[0]["image_id"] == 2
    assert {"image_id", "category_id", "score", "segmentation",
            "bbox"} <= set(anns[0])
    # scores are GBM-predicted IoUs (regression output near [0, 1] — the
    # regressor may extrapolate slightly past the target range, so bound
    # loosely rather than asserting a clamp the product never promises)
    assert all(np.isfinite(a["score"]) and -0.5 < a["score"] < 1.5
               for a in anns)


def test_scoring_artifact_export_and_daemon(workspace):
    """The best-quality configuration ships as an AOT artifact too: export
    bundles the feature-emitting device program + the fitted GBM file, and
    `serve --artifact` replays rescoring + NMS with no pipeline graph,
    config, or checkpoint. On CPU the replay is bit-equal, so the artifact
    daemon's annotations must match the live scoring daemon's exactly."""
    import glob
    import json
    import urllib.request

    import mapping_tpu.pipelines as pl
    from mapping_tpu.infer.artifact import export_serving_artifact
    from mapping_tpu.infer.daemon import (daemon_from_artifact,
                                          daemon_from_pipeline)
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"category_layers": [1, 19],
                                         "serve_batch_buckets": "1"})
    img_path = sorted(glob.glob(os.path.join(
        manager.params.data_dir, "val", "images", "*")))[1]
    with open(img_path, "rb") as f:
        body = f.read()

    def ask(port):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict", data=body,
            headers={"Content-Type": "image/jpeg", "X-Image-Id": "7"})
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())["annotations"]

    pipeline = pl.PIPELINES["unet_scoring_model"]["inference"](manager.config)
    out_dir = os.path.join(workspace["root"], "scoring_artifact")
    manifest = export_serving_artifact(pipeline, manager.config, out_dir)
    assert manifest["scoring_model"] is True
    assert manifest["pipeline"] == "ScoringInferencePipeline"
    assert "features" in manifest["outputs"]
    assert os.path.exists(os.path.join(out_dir, "scoring_model.joblib"))

    daemon = daemon_from_pipeline(pipeline, manager.config, port=0,
                                  max_wait_ms=1.0)
    daemon.start_background()
    try:
        anns_live = ask(daemon.port)
    finally:
        daemon.shutdown()

    daemon = daemon_from_artifact(out_dir, port=0, max_wait_ms=1.0)
    try:
        daemon.start_background()
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{daemon.port}/v1/health", timeout=60).read())
        assert health["scoring_model"] is True
        anns_art = ask(daemon.port)
    finally:
        daemon.shutdown()
    assert anns_art == anns_live
    assert anns_art and anns_art[0]["image_id"] == 7


def test_tta_scoring_daemon(workspace):
    """The TTA variant of the scoring pipeline serves online too: the
    device program runs the 12 deduped TTA forwards + feature extraction,
    then per-image GBM rescoring + NMS on host (unet_tta_scoring_model =
    the reference's best-quality configuration, README results ladder)."""
    import glob
    import json
    import urllib.request

    import mapping_tpu.pipelines as pl
    from mapping_tpu.infer.daemon import daemon_from_pipeline
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"category_layers": [1, 19]})
    pipeline = pl.PIPELINES["unet_tta_scoring_model"]["inference"](
        manager.config)
    daemon = daemon_from_pipeline(pipeline, manager.config, port=0,
                                  max_wait_ms=1.0)
    daemon.start_background()
    try:
        img_path = sorted(glob.glob(os.path.join(
            manager.params.data_dir, "val", "images", "*")))[2]
        with open(img_path, "rb") as f:
            body = f.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{daemon.port}/v1/predict", data=body,
            headers={"Content-Type": "image/jpeg", "X-Image-Id": "5"})
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{daemon.port}/v1/health", timeout=60).read())
    finally:
        daemon.shutdown()
    assert health["scoring_model"] is True
    assert health["pipeline"] == "ScoringInferencePipeline"
    anns = payload["annotations"]
    assert anns and anns[0]["image_id"] == 5
    assert all(np.isfinite(a["score"]) for a in anns)


def test_export_rejects_train_only_scoring_pipeline(workspace):
    import mapping_tpu.pipelines as pl
    from mapping_tpu.infer.artifact import export_serving_artifact
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"category_layers": [1, 19]})
    pipeline = pl.PIPELINES["scoring_model"]["train"](manager.config)
    with pytest.raises(ValueError, match="train-only"):
        export_serving_artifact(pipeline, manager.config,
                                os.path.join(workspace["root"], "never"))


def test_daemon_rejects_train_only_scoring_pipeline(workspace):
    import mapping_tpu.pipelines as pl
    from mapping_tpu.infer.daemon import daemon_from_pipeline
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"category_layers": [1, 19]})
    pipeline = pl.PIPELINES["scoring_model"]["train"](manager.config)
    with pytest.raises(ValueError, match="train-only"):
        daemon_from_pipeline(pipeline, manager.config)
