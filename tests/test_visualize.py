"""Prediction visualizer (VERDICT r3 next #8): GT-vs-prediction overlays
from a prediction.json — the reference's results_exploration notebook
(notebooks/results_exploration.ipynb) as a product command."""

import json
import os

import numpy as np
import pytest

from tests.fixtures.synthetic import generate


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("viz"))
    data_dir = os.path.join(root, "data")
    generate(data_dir, n_train=2, n_val=3, seed=9)
    return {"root": root, "data_dir": data_dir}


def _fake_prediction(data_dir, n=2):
    """COCO results referencing real val image ids, RLE from simple boxes."""
    from mapping_tpu.data.coco import COCOIndex
    from mapping_tpu.ops import rle as rle_ops

    gt = COCOIndex(os.path.join(data_dir, "val", "annotation.json"))
    results = []
    for image_id in sorted(gt.get_img_ids())[:n]:
        info = gt.imgs[image_id]
        mask = np.zeros((info["height"], info["width"]), np.uint8)
        mask[20:80, 30:90] = 1
        counts = rle_ops.encode(mask)["counts"]
        if isinstance(counts, bytes):  # UTF-8 string in the json on disk
            counts = counts.decode("utf-8")
        results.append({
            "image_id": image_id,
            "category_id": sorted(gt.get_cat_ids())[0],
            "score": 0.9,
            "segmentation": {"size": [info["height"], info["width"]],
                             "counts": counts},
            "bbox": [30, 20, 60, 60],
        })
    return results


def test_visualize_writes_overlays(workspace, tmp_path):
    from mapping_tpu.utils.visualize import visualize_predictions

    pred_path = os.path.join(workspace["root"], "prediction.json")
    with open(pred_path, "w") as f:
        json.dump(_fake_prediction(workspace["data_dir"]), f)

    out_dir = str(tmp_path / "overlays")
    written = visualize_predictions(pred_path, workspace["data_dir"],
                                    out_dir, n_images=2)
    assert len(written) == 2
    from PIL import Image

    for path in written:
        assert os.path.exists(path)
        arr = np.asarray(Image.open(path))
        assert arr.ndim == 3 and arr.shape[-1] == 3
        # the predicted box region is tinted toward red vs the raw tile
        red_region = arr[20:80, 30:90]
        assert red_region[..., 0].mean() > red_region[..., 2].mean()


def test_visualize_score_threshold_filters(workspace, tmp_path):
    from mapping_tpu.utils.visualize import visualize_predictions

    pred = _fake_prediction(workspace["data_dir"], n=1)
    pred_path = os.path.join(workspace["root"], "prediction_lo.json")
    with open(pred_path, "w") as f:
        json.dump(pred, f)
    ids = [pred[0]["image_id"]]
    hi = visualize_predictions(pred_path, workspace["data_dir"],
                               str(tmp_path / "hi"), image_ids=ids,
                               score_threshold=0.95)
    lo = visualize_predictions(pred_path, workspace["data_dir"],
                               str(tmp_path / "lo"), image_ids=ids,
                               score_threshold=0.0)
    from PIL import Image

    a = np.asarray(Image.open(hi[0])).astype(int)
    b = np.asarray(Image.open(lo[0])).astype(int)
    # the 0.9-score instance is filtered at threshold .95 -> overlays differ
    assert np.abs(a - b).max() > 0


def test_visualize_samples_only_gt_ids(workspace, tmp_path):
    """Predicted image_ids absent from the GT split (e.g. a prediction.json
    from a different split) must not shrink the sample: sampling draws from
    the ids the GT actually has, so the requested count is written."""
    from mapping_tpu.utils.visualize import visualize_predictions

    pred = _fake_prediction(workspace["data_dir"], n=2)
    # a foreign id that the val GT does not contain
    foreign = dict(pred[0], image_id=999999)
    pred_path = os.path.join(workspace["root"], "prediction_foreign.json")
    with open(pred_path, "w") as f:
        json.dump(pred + [foreign], f)

    written = visualize_predictions(pred_path, workspace["data_dir"],
                                    str(tmp_path / "out"), n_images=2,
                                    seed=0)
    assert len(written) == 2
    assert not any("999999" in p for p in written)


def test_border_touching_mask_gets_border_edge():
    """A mask flush against the tile edge is boundary there (out-of-image
    neighbors are background), so the 1-px hard edge the overlay promises
    is drawn along the image border too."""
    from mapping_tpu.utils.visualize import _union_and_edges

    mask = np.zeros((10, 10), bool)
    mask[0:4, 0:4] = True  # touches the top-left corner
    _, edges = _union_and_edges([mask], (10, 10))
    assert edges[0, 0] and edges[0, 2] and edges[2, 0]  # border rows/cols
    assert edges[3, 1] and edges[1, 3]                  # interior boundary
    assert not edges[1, 1]                              # true interior


def test_visualize_cli_registered():
    from click.testing import CliRunner

    from mapping_tpu.main import main

    runner = CliRunner()
    assert "visualize" in runner.invoke(main, ["--help"]).output
    out = runner.invoke(main, ["visualize", "--help"]).output
    assert "--prediction_path" in out and "--out_dir" in out


def test_visualize_drops_nms_suppressed_zero_scores(workspace, tmp_path):
    """Scoring-pipeline prediction.json files keep every instance and mark
    NMS suppression by zeroing the score; at the DEFAULT threshold those
    must not be drawn (they would paint the overlay solid red and decode
    thousands of masks per image)."""
    from mapping_tpu.utils.visualize import visualize_predictions

    pred = _fake_prediction(workspace["data_dir"], n=1)
    suppressed = dict(pred[0], score=0.0)
    base_path = os.path.join(workspace["root"], "prediction_kept.json")
    supp_path = os.path.join(workspace["root"], "prediction_supp.json")
    with open(base_path, "w") as f:
        json.dump(pred, f)
    with open(supp_path, "w") as f:
        json.dump([suppressed], f)

    kept = visualize_predictions(base_path, workspace["data_dir"],
                                 str(tmp_path / "kept"), n_images=1)
    none = visualize_predictions(supp_path, workspace["data_dir"],
                                 str(tmp_path / "none"), n_images=1)
    from PIL import Image

    a = np.asarray(Image.open(kept[0]))
    b = np.asarray(Image.open(none[0]))
    # the suppressed-only overlay differs (no prediction drawn)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0
    # and contains no prediction channel at all: equals an empty prediction
    empty_path = os.path.join(workspace["root"], "prediction_empty.json")
    with open(empty_path, "w") as f:
        json.dump([dict(pred[0], score=0.0)], f)
    c = visualize_predictions(empty_path, workspace["data_dir"],
                              str(tmp_path / "empty"), n_images=1,
                              image_ids=[pred[0]["image_id"]])
    np.testing.assert_array_equal(b, np.asarray(Image.open(c[0])))


def test_visualize_show_suppressed_draws_zero_scores(workspace, tmp_path):
    """ADVICE r4: the score==0 drop is a scoring-pipeline convention; a
    producer whose zero scores are legitimate can draw them with
    hide_suppressed=False (--show_suppressed)."""
    from PIL import Image

    from mapping_tpu.utils.visualize import visualize_predictions

    pred = _fake_prediction(workspace["data_dir"], n=1)
    zero = [dict(pred[0], score=0.0)]
    zero_path = os.path.join(workspace["root"], "prediction_zero.json")
    with open(zero_path, "w") as f:
        json.dump(zero, f)

    hidden = visualize_predictions(zero_path, workspace["data_dir"],
                                   str(tmp_path / "hidden"), n_images=1)
    shown = visualize_predictions(zero_path, workspace["data_dir"],
                                  str(tmp_path / "shown"), n_images=1,
                                  hide_suppressed=False)
    a = np.asarray(Image.open(hidden[0]))
    b = np.asarray(Image.open(shown[0]))
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_visualize_max_dets_caps_by_score(workspace, tmp_path):
    """Overlays draw at most the top-K detections by score (the eval
    protocol's maxDets): a flood of low-score junk must not change the
    overlay once the cap keeps only the high scorers."""
    from mapping_tpu.utils.visualize import visualize_predictions

    pred = _fake_prediction(workspace["data_dir"], n=1)
    info_id = pred[0]["image_id"]
    junk = []
    for k in range(40):
        j = dict(pred[0], score=1e-4)
        # tiny distinct specks so junk visibly differs when drawn
        from mapping_tpu.ops import rle as rle_ops

        size = j["segmentation"]["size"]
        mask = np.zeros(size, np.uint8)
        mask[100 + 2 * (k % 20), 100 + 2 * (k // 20)] = 1
        counts = rle_ops.encode(mask)["counts"]
        j["segmentation"] = {"size": size,
                             "counts": counts.decode("utf-8")
                             if isinstance(counts, bytes) else counts}
        junk.append(j)
    clean_path = os.path.join(workspace["root"], "prediction_clean.json")
    flood_path = os.path.join(workspace["root"], "prediction_flood.json")
    with open(clean_path, "w") as f:
        json.dump(pred, f)
    with open(flood_path, "w") as f:
        json.dump(pred + junk, f)

    from PIL import Image

    a = visualize_predictions(clean_path, workspace["data_dir"],
                              str(tmp_path / "clean"), image_ids=[info_id])
    b = visualize_predictions(flood_path, workspace["data_dir"],
                              str(tmp_path / "capped"), image_ids=[info_id],
                              max_dets=1)
    np.testing.assert_array_equal(np.asarray(Image.open(a[0])),
                                  np.asarray(Image.open(b[0])))
    c = visualize_predictions(flood_path, workspace["data_dir"],
                              str(tmp_path / "uncapped"),
                              image_ids=[info_id], max_dets=0)
    assert np.abs(np.asarray(Image.open(a[0])).astype(int)
                  - np.asarray(Image.open(c[0])).astype(int)).max() > 0
