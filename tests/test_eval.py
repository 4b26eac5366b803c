"""COCO evaluator tests: analytic AP/AR cases + full postprocess->annotate->
evaluate round trip on the synthetic fixture (expect AP ~ 1 from GT probs)."""

import json
import os

import numpy as np
import pytest

from mapping_tpu.data.coco import COCOIndex
from mapping_tpu.eval import COCOEvaluator, coco_evaluation
from mapping_tpu.ops import rle as rle_ops


def _square_rle(h, w, y0, x0, s):
    m = np.zeros((h, w), np.uint8)
    m[y0:y0 + s, x0:x0 + s] = 1
    r = rle_ops.encode(m)
    return {"size": r["size"], "counts": r["counts"].decode("utf-8")}


def _gt_dataset(h=64, w=64):
    return {
        "images": [{"id": 1, "file_name": "a.jpg", "height": h, "width": w}],
        "categories": [{"id": 100, "name": "building"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 100, "iscrowd": 0,
             "area": 400, "segmentation": _square_rle(h, w, 5, 5, 20),
             "bbox": [5.0, 5.0, 20.0, 20.0]},
            {"id": 2, "image_id": 1, "category_id": 100, "iscrowd": 0,
             "area": 100, "segmentation": _square_rle(h, w, 40, 40, 10),
             "bbox": [40.0, 40.0, 10.0, 10.0]},
        ],
    }


def _evaluate(gt, dets):
    coco_gt = COCOIndex(dataset=gt)
    coco_dt = coco_gt.load_res(dets)
    ev = COCOEvaluator(coco_gt, coco_dt)
    ev.evaluate()
    ev.accumulate()
    return ev.summarize(verbose=False)


def test_perfect_predictions_ap1():
    gt = _gt_dataset()
    dets = [
        {"image_id": 1, "category_id": 100, "score": 0.9,
         "segmentation": _square_rle(64, 64, 5, 5, 20)},
        {"image_id": 1, "category_id": 100, "score": 0.8,
         "segmentation": _square_rle(64, 64, 40, 40, 10)},
    ]
    stats = _evaluate(gt, dets)
    assert stats[0] == pytest.approx(1.0)  # AP@0.5 all
    assert stats[3] == pytest.approx(1.0)  # AR@0.5 all


def test_missed_object_lowers_recall():
    gt = _gt_dataset()
    dets = [{"image_id": 1, "category_id": 100, "score": 0.9,
             "segmentation": _square_rle(64, 64, 5, 5, 20)}]
    stats = _evaluate(gt, dets)
    assert stats[3] == pytest.approx(0.5)  # 1 of 2 found
    # interpolated AP = 101-pt average: precision 1 up to recall 0.5
    assert 0.5 <= stats[0] <= 0.51


def test_false_positive_lowers_precision():
    gt = _gt_dataset()
    dets = [
        {"image_id": 1, "category_id": 100, "score": 0.9,
         "segmentation": _square_rle(64, 64, 5, 5, 20)},
        {"image_id": 1, "category_id": 100, "score": 0.85,
         "segmentation": _square_rle(64, 64, 40, 40, 10)},
        {"image_id": 1, "category_id": 100, "score": 0.5,
         "segmentation": _square_rle(64, 64, 25, 25, 8)},  # FP, lowest score
    ]
    stats = _evaluate(gt, dets)
    assert stats[0] == pytest.approx(1.0)  # FP after all TPs: AP stays 1
    assert stats[3] == pytest.approx(1.0)


def test_low_iou_detection_is_fp():
    gt = _gt_dataset()
    dets = [
        {"image_id": 1, "category_id": 100, "score": 0.9,
         "segmentation": _square_rle(64, 64, 5, 5, 20)},
        # shifted by 8px: IoU = 12*12/(2*400-144) ~ 0.22 < 0.5
        {"image_id": 1, "category_id": 100, "score": 0.8,
         "segmentation": _square_rle(64, 64, 48, 48, 10)},
    ]
    stats = _evaluate(gt, dets)
    assert stats[3] == pytest.approx(0.5)


def test_crowd_gt_not_counted():
    gt = _gt_dataset()
    gt["annotations"][1]["iscrowd"] = 1
    dets = [{"image_id": 1, "category_id": 100, "score": 0.9,
             "segmentation": _square_rle(64, 64, 5, 5, 20)}]
    stats = _evaluate(gt, dets)
    assert stats[0] == pytest.approx(1.0)
    assert stats[3] == pytest.approx(1.0)  # crowd GT excluded from recall


def test_area_split_small_large():
    # small area threshold 14^2=196: the 10x10=100px object is 'small'
    gt = _gt_dataset()
    dets = [
        {"image_id": 1, "category_id": 100, "score": 0.9,
         "segmentation": _square_rle(64, 64, 5, 5, 20)},
        {"image_id": 1, "category_id": 100, "score": 0.8,
         "segmentation": _square_rle(64, 64, 40, 40, 10)},
    ]
    stats = _evaluate(gt, dets)
    assert stats[1] == pytest.approx(1.0)  # AP small
    assert stats[2] == pytest.approx(1.0)  # AP large


def test_end_to_end_probs_to_ap(tmp_path):
    """GT-derived probability maps -> fused postprocess -> annotations ->
    coco_evaluation: expect AP ~= 1 on the synthetic fixture."""
    from tests.fixtures.synthetic import generate
    from mapping_tpu.infer import create_annotations, postprocess_probabilities

    data_dir = generate(str(tmp_path / "data"), n_train=1, n_val=3, seed=11)
    gt_path = os.path.join(data_dir, "val", "annotation.json")
    coco = COCOIndex(gt_path)
    img_ids = coco.get_img_ids()

    probs = []
    for img_id in img_ids:
        img = coco.load_imgs([img_id])[0]
        h, w = img["height"], img["width"]
        fg = np.zeros((h, w), np.float32)
        for ann in coco.img_to_anns[img_id]:
            fg = np.maximum(fg, coco.ann_to_mask(ann).astype(np.float32))
        fg = fg * 0.9 + 0.05
        probs.append(np.stack([1 - fg, fg], axis=-1))
    probs = np.stack(probs)  # (B, 300, 300, 2)

    labels, scores, areas = postprocess_probabilities(
        probs, target_size=(300, 300), category_layers=(1, 1))
    annotations = create_annotations(
        img_ids, labels, scores, category_ids=[None, 100],
        category_layers=(1, 1))
    pred_path = str(tmp_path / "prediction.json")
    with open(pred_path, "w") as f:
        json.dump(annotations, f)

    ap, ar = coco_evaluation(gt_path, pred_path, img_ids, [100],
                             small_annotations_size=14, verbose=False)
    assert ap > 0.95
    assert ar > 0.95


def test_maxdets_truncation():
    """Only the top-maxDets detections by score count (pycocotools maxDets)."""
    h = w = 64
    gt = _gt_dataset()
    # maxDets=1: only the highest-scoring detection is kept
    dets = [
        {"image_id": 1, "category_id": 100, "score": 0.9,
         "segmentation": _square_rle(h, w, 5, 5, 20)},
        {"image_id": 1, "category_id": 100, "score": 0.8,
         "segmentation": _square_rle(h, w, 40, 40, 10)},
    ]
    coco_gt = COCOIndex(dataset=gt)
    coco_dt = coco_gt.load_res(dets)
    ev = COCOEvaluator(coco_gt, coco_dt)
    ev.evaluate()
    ev.accumulate()
    p = ev.params
    # recall at maxDets=1 (index 0) vs 100 (index 2), IoU .5 (t=0), all areas
    r1 = ev.eval["recall"][0, 0, 0, 0]
    r100 = ev.eval["recall"][0, 0, 0, 2]
    assert r1 == pytest.approx(0.5)
    assert r100 == pytest.approx(1.0)


def test_multi_image_accumulation():
    """Detections pool across images sorted by global score order."""
    h = w = 64
    gt = {
        "images": [{"id": i, "file_name": f"{i}.jpg", "height": h, "width": w}
                   for i in (1, 2)],
        "categories": [{"id": 100, "name": "building"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 100, "iscrowd": 0,
             "area": 400, "segmentation": _square_rle(h, w, 5, 5, 20)},
            {"id": 2, "image_id": 2, "category_id": 100, "iscrowd": 0,
             "area": 400, "segmentation": _square_rle(h, w, 5, 5, 20)},
        ],
    }
    dets = [
        # image 1: correct, high score
        {"image_id": 1, "category_id": 100, "score": 0.9,
         "segmentation": _square_rle(h, w, 5, 5, 20)},
        # image 2: false positive with higher score than image 2's TP
        {"image_id": 2, "category_id": 100, "score": 0.8,
         "segmentation": _square_rle(h, w, 40, 40, 10)},
        {"image_id": 2, "category_id": 100, "score": 0.7,
         "segmentation": _square_rle(h, w, 5, 5, 20)},
    ]
    stats = _evaluate(gt, dets)
    # PR points: [TP], [TP,FP], [TP,FP,TP] -> precision at recall 1.0 is 2/3
    assert stats[3] == pytest.approx(1.0)
    # 101-pt AP: precision 1 up to recall .5, 2/3 above
    expected_ap = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert stats[0] == pytest.approx(expected_ap, abs=0.01)


def test_detection_without_score_defaults_zero():
    gt = _gt_dataset()
    dets = [{"image_id": 1, "category_id": 100,
             "segmentation": _square_rle(64, 64, 5, 5, 20)}]
    stats = _evaluate(gt, dets)
    assert stats[3] == pytest.approx(0.5)
