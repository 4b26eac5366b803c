"""Randomized cross-check: COCOEvaluator vs an independent brute-force
AP/AR implementation at IoU=0.5 (single threshold, no ignores/crowd).

The brute-force version below shares NO code with mapping_tpu.eval — it is a
direct transcription of the metric definition: detections sorted by score
globally, greedy best-IoU matching per image, 101-point interpolated AP.
"""

import numpy as np
import pytest

from mapping_tpu.data.coco import COCOIndex
from mapping_tpu.eval import COCOEvaluator
from mapping_tpu.ops import rle as rle_ops


def _mask_rle(mask):
    r = rle_ops.encode(mask.astype(np.uint8))
    return {"size": r["size"], "counts": r["counts"].decode()}


def _iou(a, b):
    inter = np.count_nonzero(a & b)
    union = np.count_nonzero(a | b)
    return inter / union if union else 0.0


def brute_force_ap_ar(gt_masks, det_masks, det_scores, det_imgs, gt_imgs):
    """Single IoU threshold 0.5, maxDets=100 per image, no crowd."""
    order = np.argsort(-np.asarray(det_scores), kind="mergesort")
    matched_gt = set()
    tp_flags = []
    for d_idx in order:
        img = det_imgs[d_idx]
        best, best_iou = None, 0.5 - 1e-10
        for g_idx, g_img in enumerate(gt_imgs):
            if g_img != img or g_idx in matched_gt:
                continue
            iou = _iou(det_masks[d_idx], gt_masks[g_idx])
            if iou > best_iou:
                best, best_iou = g_idx, iou
        if best is not None:
            matched_gt.add(best)
            tp_flags.append(1)
        else:
            tp_flags.append(0)
    tp = np.cumsum(tp_flags)
    fp = np.cumsum([1 - f for f in tp_flags])
    n_gt = len(gt_masks)
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-12)
    # monotone interpolation + 101-point sampling
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    rec_thrs = np.linspace(0, 1, 101)
    inds = np.searchsorted(recall, rec_thrs, side="left")
    q = np.zeros(101)
    for ri, pi in enumerate(inds):
        if pi < len(precision):
            q[ri] = precision[pi]
    ap = q.mean()
    ar = recall[-1] if len(recall) else 0.0
    return ap, ar


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_evaluator_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    h = w = 48
    n_imgs = 3
    gt_masks, gt_imgs, gt_anns = [], [], []
    images = [{"id": i + 1, "file_name": f"{i}.jpg", "height": h, "width": w}
              for i in range(n_imgs)]
    ann_id = 1
    for img_id in range(1, n_imgs + 1):
        for _ in range(rng.randint(1, 4)):
            m = np.zeros((h, w), bool)
            y, x = rng.randint(0, 34, 2)
            s = rng.randint(6, 14)
            m[y:y + s, x:x + s] = True
            gt_masks.append(m)
            gt_imgs.append(img_id)
            gt_anns.append({"id": ann_id, "image_id": img_id,
                            "category_id": 1, "iscrowd": 0,
                            "area": int(m.sum()),
                            "segmentation": _mask_rle(m)})
            ann_id += 1

    det_masks, det_imgs, det_scores, dets = [], [], [], []
    # detections: jittered copies of GTs + random false positives
    for g_idx, m in enumerate(gt_masks):
        if rng.rand() < 0.8:  # found, with jitter
            dy, dx = rng.randint(-3, 4, 2)
            shifted = np.roll(np.roll(m, dy, 0), dx, 1)
            score = float(rng.rand() * 0.5 + 0.5)
            det_masks.append(shifted)
            det_imgs.append(gt_imgs[g_idx])
            det_scores.append(score)
    for _ in range(rng.randint(0, 4)):  # false positives
        m = np.zeros((h, w), bool)
        y, x = rng.randint(0, 38, 2)
        s = rng.randint(4, 10)
        m[y:y + s, x:x + s] = True
        det_masks.append(m)
        det_imgs.append(int(rng.randint(1, n_imgs + 1)))
        det_scores.append(float(rng.rand() * 0.5))
    for m, img, score in zip(det_masks, det_imgs, det_scores):
        dets.append({"image_id": img, "category_id": 1, "score": score,
                     "segmentation": _mask_rle(m)})

    gt = {"images": images, "categories": [{"id": 1, "name": "b"}],
          "annotations": gt_anns}
    coco_gt = COCOIndex(dataset=gt)
    coco_dt = coco_gt.load_res(dets)
    ev = COCOEvaluator(coco_gt, coco_dt)
    # single-threshold setup so both implementations measure the same thing
    ev.params.area_rng = [[0, 1e10]]
    ev.params.area_rng_lbl = ["all"]
    ev.evaluate()
    ev.accumulate()
    t = 0  # IoU=0.5 index
    ap_ours = ev.eval["precision"][t, :, 0, 0, 2]
    ap_ours = float(ap_ours[ap_ours > -1].mean())
    ar_ours = float(ev.eval["recall"][t, 0, 0, 2])

    ap_bf, ar_bf = brute_force_ap_ar(gt_masks, det_masks, det_scores,
                                     det_imgs, gt_imgs)
    assert ap_ours == pytest.approx(ap_bf, abs=1e-6), (ap_ours, ap_bf)
    assert ar_ours == pytest.approx(ar_bf, abs=1e-6)
