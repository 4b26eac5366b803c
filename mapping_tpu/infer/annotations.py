"""Labeled instance maps -> COCO result annotations.

Parity target: create_annotations (reference src/utils.py:76-118): decompose
each threshold layer into binary instance masks, Fortran-order RLE encode
(UTF-8 counts), derive bbox from the RLE, attach the per-instance score, and
map the layer index to its emitting category via
searchsorted(cumsum(category_layers)) — category_ids[c] = None layers are
skipped (the background channel).

The per-instance extraction runs on compact numpy label maps (already
computed on device by infer.postprocess); RLE encoding uses the C++ fast
path when built (cpp/rle.cpp).
"""

from typing import List, Optional, Sequence

import numpy as np

from mapping_tpu.ops import rle as rle_ops

try:  # C++ single-pass extractor (cpp/rle.cpp); numpy fallback below
    from mapping_tpu.utils import native as _native
except Exception:  # pragma: no cover
    _native = None


def labeled_to_annotations(
    image_id: int,
    labels: np.ndarray,
    scores,
    category_ids: Sequence[Optional[int]],
    category_layers: Sequence[int],
    emit_suppressed: bool = True,
) -> List[dict]:
    """labels (L, H, W) int32, scores (L, max_instances) array or
    list-of-lists per layer -> result dicts.

    emit_suppressed=False drops instances whose score is exactly 0.0 — the
    scoring pipelines' NMS marks suppression by zeroing the score, never
    removing the instance (scoring.py remove_overlapping_masks, reference
    src/postprocessing.py:367-380), so a 19-layer prediction.json carries
    ~1.5k junk rows/image unless the writer drops them. The eval protocol
    ranks by score and caps at maxDets=100, so the default writer-side
    drop is configured per pipeline by the manager (`emit_suppressed`
    param), not here."""
    annotations = []
    layer_to_cat = np.searchsorted(
        np.cumsum(category_layers), np.arange(labels.shape[0]), side="right")
    for layer_nr in range(labels.shape[0]):
        category_id = category_ids[layer_to_cat[layer_nr]]
        if category_id is None:
            continue
        layer = labels[layer_nr]
        layer_scores = scores[layer_nr]
        # scores are padded to max_instances on device; postprocess escalates
        # the pad for dense images, so hitting this clamp means the
        # MAX_INSTANCES_CEILING was exceeded — never drop silently
        n_instances = min(int(layer.max()), len(layer_scores))
        if int(layer.max()) > len(layer_scores):
            from mapping_tpu.utils.logging import get_logger

            get_logger().warning(
                "annotations: image %d layer %d has %d instances but only "
                "%d score slots; dropping the tail",
                int(image_id), layer_nr, int(layer.max()), len(layer_scores))
        if n_instances == 0:
            continue
        h, w = layer.shape
        if _native is not None and _native.available():
            packed = _native.rle_instances(layer, n_instances)
            for label_nr, (counts, bbox) in enumerate(packed, start=1):
                score = float(layer_scores[label_nr - 1])
                if not emit_suppressed and score == 0.0:
                    continue
                annotations.append({
                    "image_id": int(image_id),
                    "category_id": int(category_id),
                    "score": score,
                    "segmentation": {"size": [h, w],
                                     "counts": counts.decode("utf-8")},
                    "bbox": bbox,
                })
            continue
        for label_nr in range(1, n_instances + 1):
            score = float(layer_scores[label_nr - 1])
            if not emit_suppressed and score == 0.0:
                continue
            mask = (layer == label_nr).astype(np.uint8)
            rle = rle_ops.encode(mask)
            annotations.append({
                "image_id": int(image_id),
                "category_id": int(category_id),
                "score": score,
                "segmentation": {
                    "size": rle["size"],
                    "counts": rle["counts"].decode("utf-8"),
                },
                "bbox": rle_ops.to_bbox(rle),
            })
    return annotations


def create_annotations(
    image_ids: Sequence[int],
    labels_batch: np.ndarray,
    scores_batch: np.ndarray,
    category_ids: Sequence[Optional[int]],
    category_layers: Sequence[int],
) -> List[dict]:
    """Batch driver: (B, L, H, W) labels + (B, L, N) scores -> annotations."""
    annotations = []
    for image_id, labels, scores in zip(image_ids, labels_batch, scores_batch):
        annotations.extend(labeled_to_annotations(
            image_id, np.asarray(labels), np.asarray(scores),
            category_ids, category_layers))
    return annotations
