"""Post-hoc prediction visualization: GT-vs-prediction overlays.

The reference team's operational quality check was a notebook that overlaid
ground-truth and predicted instances from a prediction.json on sampled
images (reference notebooks/results_exploration.ipynb; SURVEY.md §4.5).
Here it is a product command:

    python -m mapping_tpu.main visualize \
        --prediction_path experiment/prediction.json --out_dir overlays/

Each written PNG shows the tile with ground-truth instances tinted green
and predicted instances tinted red (overlap blends to yellow-ish), with
hard 1-px instance boundaries, so false positives/negatives and boundary
quality can be eyeballed for any prediction.json — live, artifact, or
daemon provenance.
"""

import json
import os
from typing import List, Optional, Sequence

import numpy as np

from mapping_tpu.utils.logging import get_logger

logger = get_logger()

_GT_COLOR = np.array([40, 220, 70], np.float32)      # green
_PRED_COLOR = np.array([235, 60, 50], np.float32)    # red
_FILL_ALPHA = 0.35
_EDGE_ALPHA = 0.95


def _union_and_edges(masks: Sequence[np.ndarray], shape):
    """(filled union, 1-px boundary union) over instance masks."""
    union = np.zeros(shape, bool)
    edges = np.zeros(shape, bool)
    for m in masks:
        m = m.astype(bool)
        interior = m.copy()
        interior[1:, :] &= m[:-1, :]
        interior[:-1, :] &= m[1:, :]
        interior[:, 1:] &= m[:, :-1]
        interior[:, :-1] &= m[:, 1:]
        # out-of-image neighbors are background: a mask flush against the
        # tile edge still gets its 1-px boundary drawn along that edge
        interior[0, :] = interior[-1, :] = False
        interior[:, 0] = interior[:, -1] = False
        edges |= m & ~interior
        union |= m
    return union, edges


def overlay_instances(image_u8: np.ndarray,
                      gt_masks: Sequence[np.ndarray],
                      pred_masks: Sequence[np.ndarray]) -> np.ndarray:
    """(H, W, 3) uint8 tile with GT tinted green, predictions red."""
    out = image_u8.astype(np.float32)
    for masks, color in ((gt_masks, _GT_COLOR), (pred_masks, _PRED_COLOR)):
        if not masks:
            continue
        fill, edges = _union_and_edges(masks, image_u8.shape[:2])
        out[fill] = out[fill] * (1 - _FILL_ALPHA) + color * _FILL_ALPHA
        out[edges] = out[edges] * (1 - _EDGE_ALPHA) + color * _EDGE_ALPHA
    return np.clip(out, 0, 255).astype(np.uint8)


def visualize_predictions(prediction_path: str, data_dir: str, out_dir: str,
                          dataset: str = "val", n_images: int = 8,
                          image_ids: Optional[Sequence[int]] = None,
                          score_threshold: float = 0.0,
                          max_dets: int = 100,
                          hide_suppressed: bool = True,
                          seed: int = 1234) -> List[str]:
    """Write GT-vs-prediction overlay PNGs for sampled images.

    prediction_path: a COCO results json (what `evaluate`/`predict_on_dir`
    write). data_dir/dataset holds annotation.json + images/ in the
    reference layout. image_ids overrides the deterministic sample.
    max_dets: draw at most the top-K detections per image by score — the
    COCO eval protocol's maxDets cap, so the overlay shows what the metric
    ranks; scoring-pipeline jsons carry every candidate instance (GBM
    scores ~1e-4 for junk), and drawing them all would bury the real
    detections. Returns the written file paths.
    hide_suppressed (default on): drop score==0.0 instances even at
    score_threshold 0 — in scoring-pipeline jsons written with
    `emit_suppressed: 1`, a zero score marks an NMS-suppressed instance
    (scoring.py zeroes, never removes), and thousands of suppressed masks
    per image would paint the overlay solid red. Pass False to draw
    legitimate zero-score detections from other producers.
    """
    from PIL import Image

    from mapping_tpu.data.coco import COCOIndex
    from mapping_tpu.data.loader import load_image

    gt = COCOIndex(os.path.join(data_dir, dataset, "annotation.json"))
    with open(prediction_path) as f:
        results = json.load(f)
    dt = gt.load_res(results) if results else None

    if image_ids is None:
        # sample only ids the GT split actually has — predicted ids from a
        # different split would be skipped below and silently shrink the
        # requested sample even when enough valid candidates exist
        predicted = {int(r["image_id"]) for r in results}
        valid = predicted & set(gt.imgs)
        candidates = sorted(valid) or sorted(gt.get_img_ids())
        dropped = len(predicted) - len(valid)
        if dropped:
            logger.warning("%d predicted image id(s) absent from %s GT; "
                           "sampling the rest", dropped, dataset)
        rng = np.random.RandomState(seed)
        take = min(int(n_images), len(candidates))
        image_ids = sorted(rng.choice(candidates, size=take, replace=False))

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for image_id in image_ids:
        image_id = int(image_id)
        if image_id not in gt.imgs:
            logger.warning("image id %d not in %s GT; skipped", image_id,
                           dataset)
            continue
        info = gt.imgs[image_id]
        tile = load_image(os.path.join(data_dir, dataset, "images",
                                       info["file_name"]))
        gt_masks = [gt.ann_to_mask(a) for a in
                    gt.load_anns(gt.get_ann_ids(img_ids=[image_id]))]
        pred_anns = (dt.load_anns(dt.get_ann_ids(img_ids=[image_id]))
                     if dt is not None else [])
        # hide_suppressed: score 0.0 marks an NMS-suppressed instance in
        # scoring-pipeline prediction.json files written with
        # emit_suppressed: 1 — hidden by default, drawable via the flag
        # (a zero-score detection from another producer is legitimate)
        kept = [a for a in pred_anns
                if (not hide_suppressed or float(a.get("score", 1.0)) > 0.0)
                and float(a.get("score", 1.0)) >= score_threshold]
        kept.sort(key=lambda a: -float(a.get("score", 1.0)))  # stable
        # strictly-positive gate: 0 means unlimited, and a negative value
        # must not silently slice detections off the tail
        if max_dets > 0 and len(kept) > max_dets:
            logger.info(
                "image %d: drawing top %d of %d detections by score (the "
                "eval maxDets protocol); raise --score_threshold to cut "
                "low-score instances", image_id, max_dets, len(kept))
            kept = kept[:max_dets]
        pred_masks = [dt.ann_to_mask(a) for a in kept]
        overlay = overlay_instances(tile, gt_masks, pred_masks)
        path = os.path.join(out_dir, f"overlay_{image_id}.png")
        Image.fromarray(overlay).save(path)
        written.append(path)
        logger.info("wrote %s (gt=%d pred=%d)", path, len(gt_masks),
                    len(pred_masks))
    return written
