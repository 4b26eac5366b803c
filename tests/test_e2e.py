"""End-to-end: prepare_masks -> prepare_metadata -> train -> evaluate on the
synthetic fixture, through the PipelineManager (the reference's de-facto
dev_mode smoke test, SURVEY.md §4)."""

import os

import numpy as np
import pytest
import yaml

from tests.fixtures.synthetic import generate

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = os.path.join(str(root), "data")
    generate(data_dir, n_train=8, n_val=4, seed=21)
    params = {
        "data_dir": data_dir,
        "meta_dir": os.path.join(str(root), "meta"),
        "experiment_dir": os.path.join(str(root), "experiment"),
        "encoder": "from_scratch",
        "n_filters": 8,
        "repeat_blocks": 2,
        "image_h": 64,
        "image_w": 64,
        "batch_size_train": 4,
        "batch_size_inference": 4,
        "epochs_nr": 10,
        "lr": 0.003,
        "gamma": 1.0,
        "patience": 100,
        "validate_with_map": 1,
        "evaluation_data_sample": 4,
        "dice_smooth": 1,
    }
    config_path = os.path.join(str(root), "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"parameters": params}, f)
    return {"root": str(root), "config": config_path, "data_dir": data_dir}


def test_full_cycle(workspace):
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    manager.prepare_masks(dev_mode=False)
    manager.prepare_metadata(train_data=True, valid_data=True)

    meta_path = os.path.join(manager.params.meta_dir, "metadata.csv")
    assert os.path.exists(meta_path)

    manager.train("unet", dev_mode=False)
    ckpt = os.path.join(manager.params.experiment_dir, "transformers",
                        "unet.msgpack")
    assert os.path.exists(ckpt)

    ap, ar = manager.evaluate("unet", dev_mode=False, chunk_size=None)
    # easy synthetic data: a short training should reach decent AP
    assert ap > 0.3, f"AP too low: {ap}"
    assert os.path.exists(os.path.join(manager.params.experiment_dir,
                                       "prediction.json"))


def test_predict_on_dir(workspace):
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    pred_path = os.path.join(workspace["root"], "submission.json")
    manager.predict_on_dir(
        "unet", os.path.join(workspace["data_dir"], "val", "images"),
        pred_path, chunk_size=2)
    import json

    with open(pred_path) as f:
        prediction = json.load(f)
    assert prediction
    assert {"image_id", "category_id", "score", "segmentation",
            "bbox"} <= set(prediction[0])


def test_evaluate_tta_pipeline(workspace):
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    ap, ar = manager.evaluate("unet_tta", dev_mode=False, chunk_size=None)
    assert ap > 0.3


def test_evaluate_tta_crop_and_pad(workspace):
    """unet_tta with loader_mode=crop_and_pad: padded inference + TTA +
    center-crop undo (reference src/pipelines.py:113-125)."""
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"loader_mode": "crop_and_pad"})
    ap, ar = manager.evaluate("unet_tta", dev_mode=False, chunk_size=None)
    assert ap > 0.2


def test_evaluate_padded_pipeline(workspace):
    """unet_padded: replicate-pad inference + center-crop undo
    (reference src/pipelines.py:55-91)."""
    from mapping_tpu.manager import PipelineManager

    # default h_pad=10: 300 -> 320, divisible by the scratch UNet's 2 pools;
    # center crop back to the 300x300 tile so predictions align with GT
    manager = PipelineManager(workspace["config"])
    ap, ar = manager.evaluate("unet_padded", dev_mode=False, chunk_size=None)
    assert ap > 0.15


def test_evaluate_stream_mode_matches_batch(workspace):
    """stream_mode=1: per-image generator through the whole chain
    (reference src/utils.py:392-413) must give the same AP as the batch
    path (VERDICT r1 missing #5)."""
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    ap_batch, _ = manager.evaluate("unet", dev_mode=False, chunk_size=None)
    manager_s = PipelineManager(workspace["config"],
                                overrides={"stream_mode": 1})
    ap_stream, _ = manager_s.evaluate("unet", dev_mode=False, chunk_size=None)
    assert ap_stream == ap_batch


def test_transform_stream_is_lazy(workspace):
    """transform_stream must not postprocess ahead of consumption: after
    pulling ONE image from the generator, at most one batch may have gone
    through postprocessing (reference generator-transformer semantics,
    src/utils.py:392-413)."""
    import pandas as pd

    import mapping_tpu.pipelines as pl
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    meta = pd.read_csv(os.path.join(manager.params.meta_dir, "metadata.csv"))
    meta_val = meta[meta["is_valid"] == 1]

    pipeline = pl.PIPELINES["unet"]["inference"](manager.config)
    # count fused-serve collects (each = one postprocessed batch pulled to
    # host). The serving loop keeps ONE batch in flight (dispatch k+1 before
    # collect k) — that async lookahead is bounded pipelining, not eager
    # materialization; laziness is about host-side pulls.
    serve = pipeline.serve_program(return_features=False)
    calls = {"n": 0}

    class Counting:
        def dispatch(self, images):
            return serve.dispatch(images)

        def collect(self, handle):
            calls["n"] += 1
            return serve.collect(handle)

    pipeline._serve_cache[False] = Counting()
    data = {
        "input": {"meta": meta_val,
                  "target_sizes": [(300, 300)] * len(meta_val)},
        "specs": {"train_mode": False},
        "callback_input": {"meta_valid": None},
    }
    stream = pipeline.transform_stream(data)["y_pred"]
    assert calls["n"] == 0  # nothing ran before consumption
    next(stream)
    assert calls["n"] == 1  # exactly one batch served


def test_validation_monitor_geometry_follows_config(tmp_path):
    """VERDICT r4 next #5: per-epoch COCO-AP validation must run at the
    CONFIG's geometry (crop_image_h/w), not hardcoded (300, 300) — on a
    256x256-tile dataset the best per-epoch AP recorded by the monitor must
    equal a post-hoc `evaluate` of the best checkpoint (same val sample,
    same serve geometry). Before the fix the monitor scored 300x300 labels
    against 256x256 GT and the APs diverged."""
    import json

    from mapping_tpu.manager import PipelineManager

    data_dir = os.path.join(str(tmp_path), "data")
    generate(data_dir, n_train=6, n_val=3, seed=33, tile=(256, 256))
    params = {
        "data_dir": data_dir,
        "meta_dir": os.path.join(str(tmp_path), "meta"),
        "experiment_dir": os.path.join(str(tmp_path), "experiment"),
        "encoder": "from_scratch",
        "n_filters": 8,
        "repeat_blocks": 2,
        "image_h": 64,
        "image_w": 64,
        "crop_image_h": 256,
        "crop_image_w": 256,
        "batch_size_train": 3,
        "batch_size_inference": 3,
        "epochs_nr": 3,
        "lr": 0.003,
        "patience": 100,
        "validate_with_map": 1,
        "evaluation_data_sample": 3,
    }
    config_path = os.path.join(str(tmp_path), "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"parameters": params}, f)

    manager = PipelineManager(config_path)
    manager.prepare_masks(dev_mode=False)
    manager.prepare_metadata(train_data=True, valid_data=True)
    manager.train("unet", dev_mode=False)

    epoch_aps = []
    with open(os.path.join(params["experiment_dir"], "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["channel"] == "unet epoch_val sum":
                epoch_aps.append(rec["y"])
    assert epoch_aps, "no per-epoch validation AP recorded"

    ap, _ = manager.evaluate("unet", dev_mode=False, chunk_size=None)
    # the cached transformer IS the best-AP checkpoint; evaluate scores the
    # same val sample through the same fused serve program
    assert ap == max(epoch_aps), (ap, epoch_aps)


def test_serving_daemon_from_trained_pipeline(workspace):
    """The online serving daemon built from a trained pipeline (the CLI
    `serve` command path): POST a real validation tile, get the same COCO
    annotations evaluate would write for it."""
    import glob
    import json
    import urllib.request

    import mapping_tpu.pipelines as pl
    from mapping_tpu.infer.daemon import daemon_from_pipeline
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    pipeline = pl.PIPELINES["unet"]["inference"](manager.config)
    daemon = daemon_from_pipeline(pipeline, manager.config, port=0,
                                  max_wait_ms=1.0)
    daemon.start_background()
    try:
        img_path = sorted(glob.glob(os.path.join(
            workspace["data_dir"], "val", "images", "*")))[0]
        with open(img_path, "rb") as f:
            body = f.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{daemon.port}/v1/predict", data=body,
            headers={"Content-Type": "image/jpeg", "X-Image-Id": "1"})
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
    finally:
        daemon.shutdown()
    anns = payload["annotations"]
    # trained model on the easy fixture: at least one detected building,
    # with the full COCO result schema at the evaluate target size
    assert anns, "trained daemon returned no detections"
    assert {"image_id", "category_id", "score", "segmentation",
            "bbox"} <= set(anns[0])
    assert anns[0]["image_id"] == 1
    assert anns[0]["segmentation"]["size"] == [300, 300]


def test_evaluate_quantized_serving_close_to_float(workspace):
    """quantized_serving=1: the int8 PTQ path (models/quantize.py) must
    reproduce the float pipeline's quality on the fixture — PTQ on this
    easy set should cost (at most) a small AP delta."""
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    ap_float, _ = manager.evaluate("unet", dev_mode=False, chunk_size=None)
    manager_q = PipelineManager(workspace["config"],
                                overrides={"quantized_serving": 1,
                                           "quant_calib_images": 4})
    ap_q, _ = manager_q.evaluate("unet", dev_mode=False, chunk_size=None)
    assert ap_q > ap_float - 0.05, (ap_q, ap_float)


def test_evaluate_quantized_tta_composes(workspace):
    """int8 PTQ + TTA in one program: `quantized_serving: 1` plugs the
    quantized probs_fn into the same FusedServe that expands/inverts the TTA
    variants, so the best-quality serving config also gets the int8 forward.
    Quality must match the float TTA path on the fixture."""
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    ap_float, _ = manager.evaluate("unet_tta", dev_mode=False,
                                   chunk_size=None)
    manager_q = PipelineManager(workspace["config"],
                                overrides={"quantized_serving": 1,
                                           "quant_calib_images": 4})
    ap_q, _ = manager_q.evaluate("unet_tta", dev_mode=False, chunk_size=None)
    assert ap_q > ap_float - 0.05, (ap_q, ap_float)


def test_serving_daemon_through_mesh_drops_indivisible_buckets(workspace):
    """Daemon over a data_parallel=1 pipeline on the 8-device CPU mesh:
    bucket sizes that don't divide over the 'data' axis are dropped (a
    shard_map program can't run them), the full batch shape still serves,
    and a posted tile comes back with the same annotation schema."""
    import glob
    import json
    import urllib.request

    import mapping_tpu.pipelines as pl
    from mapping_tpu.infer.daemon import daemon_from_pipeline
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"data_parallel": 1,
                                         "batch_size_inference": 8,
                                         "serve_batch_buckets": "1,2,8"})
    pipeline = pl.PIPELINES["unet"]["inference"](manager.config)
    assert pipeline.trainer.mesh is not None
    daemon = daemon_from_pipeline(pipeline, manager.config, port=0,
                                  max_wait_ms=1.0)
    daemon.start_background()
    try:
        assert daemon.batcher._buckets == [8]  # 1 and 2 don't divide over 8
        img_path = sorted(glob.glob(os.path.join(
            workspace["data_dir"], "val", "images", "*")))[0]
        with open(img_path, "rb") as f:
            body = f.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{daemon.port}/v1/predict", data=body,
            headers={"Content-Type": "image/jpeg", "X-Image-Id": "3"})
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
    finally:
        daemon.shutdown()
    anns = payload["annotations"]
    assert anns and anns[0]["image_id"] == 3
    assert daemon.batcher.stats["bucket_batches"] == {"8": 1}
    assert daemon.batcher.stats["images_padded"] == 7


def test_quantized_daemon_recalibrates_in_background(workspace):
    """VERDICT r4 next #6: on the ONLINE daemon, a trainer.load() mid-serve
    must not stall a request for the multi-second qtable rebuild — the
    request is served from the previous int8 snapshot while the rebuild
    runs in the background, and /v1/stats surfaces {recalibrations,
    serving_stale_batches}."""
    import glob
    import json
    import time
    import urllib.request

    import jax

    import mapping_tpu.pipelines as pl
    from mapping_tpu.infer.daemon import daemon_from_pipeline
    from mapping_tpu.manager import PipelineManager
    from mapping_tpu.train.checkpoint import save_state

    manager = PipelineManager(workspace["config"], overrides={
        "quantized_serving": 1, "quant_calib_images": 4})
    pipeline = pl.PIPELINES["unet"]["inference"](manager.config)
    pipeline.trainer.load(pipeline.trainer_cache_path)
    pipeline._weights_loaded = True
    daemon = daemon_from_pipeline(pipeline, manager.config, port=0,
                                  max_wait_ms=1.0)
    daemon.start_background()
    try:
        img_path = sorted(glob.glob(os.path.join(
            workspace["data_dir"], "val", "images", "*")))[0]
        with open(img_path, "rb") as f:
            body = f.read()

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{daemon.port}/v1/predict", data=body,
                headers={"Content-Type": "image/jpeg", "X-Image-Id": "1"})
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        def stats():
            return json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{daemon.port}/v1/stats",
                timeout=60).read())

        post()
        s0 = stats()
        assert s0["recalibrations"] == 0
        assert s0["serving_stale_batches"] == 0

        # weight drift: a perturbed checkpoint loaded into the live trainer
        perturbed = os.path.join(workspace["root"], "perturbed_daemon.msgpack")
        scaled = jax.tree_util.tree_map(lambda l: l * 0.2,
                                        pipeline.trainer.state.params)
        save_state(pipeline.trainer.state.replace(params=scaled), perturbed)
        pipeline.trainer.load(perturbed)

        post()  # served from the previous snapshot, rebuild kicked off
        s1 = stats()
        assert s1["recalibrations"] >= 1
        assert s1["serving_stale_batches"] >= 1

        # the background swap lands: stale counting stops growing
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            before = stats()["serving_stale_batches"]
            post()
            if stats()["serving_stale_batches"] == before:
                break
            time.sleep(0.2)
        else:
            raise AssertionError("recalibration never swapped in")
    finally:
        daemon.shutdown()


def test_quantized_serving_follows_weight_reload(workspace):
    """VERDICT r3 next #4: `trainer.load()` AFTER serve_program() with
    `quantized_serving: 1` serves the NEW weights — the packed int8 kernels
    recalibrate on the trainer's (version, step) drift instead of silently
    serving the build-time snapshot."""
    import jax

    from mapping_tpu.manager import PipelineManager
    from mapping_tpu.pipelines import PIPELINES
    from mapping_tpu.train.checkpoint import save_state

    manager = PipelineManager(workspace["config"], overrides={
        "quantized_serving": 1, "quant_calib_images": 4})
    p = PIPELINES["unet"]["inference"](manager.config)
    p.trainer.load(p.trainer_cache_path)
    images = p._calibration_images()
    serve = p.serve_program()
    labels_trained = np.asarray(serve(images)[0])
    assert labels_trained.max() > 0  # trained weights find instances

    # a different checkpoint (perturbed weights) loaded into the SAME
    # trainer after the serve program was built
    perturbed = os.path.join(workspace["root"], "perturbed.msgpack")
    scaled = jax.tree_util.tree_map(lambda l: l * 0.2, p.trainer.state.params)
    save_state(p.trainer.state.replace(params=scaled), perturbed)
    version_before = p.trainer._state_version
    p.trainer.load(perturbed)
    assert p.trainer._state_version == version_before + 1

    labels_reloaded = np.asarray(serve(images)[0])
    assert not np.array_equal(labels_trained, labels_reloaded), (
        "quantized serve still returned the stale build-time weights")
