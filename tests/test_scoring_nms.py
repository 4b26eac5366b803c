"""NMS across threshold layers: the RLE fast path must reproduce the
dense per-pair-mask oracle exactly (same suppressed set, same zeroed
scores), including ties, empty masks, and score slots past the labeled
instance count. Reference semantics: src/postprocessing.py:367-380."""

import copy

import numpy as np
import pytest

from mapping_tpu.scoring import (_remove_overlapping_masks_dense,
                                 remove_overlapping_masks)
from mapping_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="C++ RLE library unavailable")


def _random_layers(rng, n_layers, h, w, max_instances):
    """Labeled layers of overlapping random rectangles (nested copies
    across layers mimic the threshold-ladder structure)."""
    labels = np.zeros((n_layers, h, w), dtype=np.int32)
    scores = []
    base_rects = [(rng.integers(0, h - 4), rng.integers(0, w - 4),
                   rng.integers(2, h // 2), rng.integers(2, w // 2))
                  for _ in range(max_instances)]
    for layer in range(n_layers):
        n = int(rng.integers(0, max_instances + 1))
        for i in range(n):
            r, c, hh, ww = base_rects[i]
            # shrink per layer like a rising threshold does
            shrink = layer + int(rng.integers(0, 2))
            r2, c2 = min(r + hh - shrink, h), min(c + ww - shrink, w)
            if r2 > r and c2 > c:
                labels[layer, r:r2, c:c2] = i + 1
        # sometimes hand out more score slots than labeled instances
        n_scores = n + int(rng.integers(0, 2))
        scores.append(rng.random(n_scores))
    return labels, scores


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_fast_path_matches_dense_oracle(seed):
    rng = np.random.default_rng(seed)
    labels, scores = _random_layers(rng, n_layers=4, h=24, w=20,
                                    max_instances=6)
    s_fast = [np.array(s) for s in scores]
    s_dense = [np.array(s) for s in scores]
    remove_overlapping_masks(copy.deepcopy(labels), s_fast, 0.5)
    _remove_overlapping_masks_dense(copy.deepcopy(labels), s_dense, 0.5)
    for a, b in zip(s_fast, s_dense):
        np.testing.assert_array_equal(a, b)


def test_tied_scores_keep_insertion_order():
    # two identical masks with the SAME score: the first (lower layer)
    # survives, the second is suppressed — stable-sort semantics
    labels = np.zeros((2, 8, 8), dtype=np.int32)
    labels[0, 2:6, 2:6] = 1
    labels[1, 2:6, 2:6] = 1
    s_fast = [np.array([0.7]), np.array([0.7])]
    s_dense = [np.array([0.7]), np.array([0.7])]
    remove_overlapping_masks(labels.copy(), s_fast, 0.5)
    _remove_overlapping_masks_dense(labels.copy(), s_dense, 0.5)
    assert s_fast[0][0] == 0.7 and s_fast[1][0] == 0.0
    for a, b in zip(s_fast, s_dense):
        np.testing.assert_array_equal(a, b)


def test_iou_exactly_at_threshold_is_not_suppressed():
    # IoU == 0.5 exactly: strict > means both survive
    labels = np.zeros((2, 8, 8), dtype=np.int32)
    labels[0, 0:2, 0:4] = 1          # 8 px
    labels[1, 0:2, 0:2] = 1          # 4 px inside -> inter 4, union 8
    s = [np.array([0.9]), np.array([0.8])]
    remove_overlapping_masks(labels, s, 0.5)
    assert s[0][0] == 0.9 and s[1][0] == 0.8


def test_empty_masks_and_extra_score_slots_survive():
    labels = np.zeros((2, 8, 8), dtype=np.int32)
    labels[0, 1:5, 1:5] = 1
    # layer 1 has NO pixels but two score slots
    s = [np.array([0.9]), np.array([0.5, 0.4])]
    remove_overlapping_masks(labels, s, 0.5)
    assert s[0][0] == 0.9
    np.testing.assert_array_equal(s[1], [0.5, 0.4])


def test_scale_smoke_many_specks():
    # hundreds of non-overlapping specks + nested duplicates finish fast
    rng = np.random.default_rng(9)
    h = w = 64
    labels = np.zeros((3, h, w), dtype=np.int32)
    n = 300
    cells = rng.permutation(h * w // 4)[:n]
    for i, cell in enumerate(cells):
        r, c = 2 * (cell // (w // 2)), 2 * (cell % (w // 2))
        for layer in range(3):
            labels[layer, r, c] = i + 1
    scores = [rng.random(n) for _ in range(3)]
    dense_scores = [s.copy() for s in scores]
    remove_overlapping_masks(labels.copy(), scores, 0.5)
    _remove_overlapping_masks_dense(labels.copy(), dense_scores, 0.5)
    for a, b in zip(scores, dense_scores):
        np.testing.assert_array_equal(a, b)
    # each speck appears identically in 3 layers: exactly one copy lives
    alive = sum(int(np.count_nonzero(s)) for s in scores)
    assert alive == n


def test_gt_iou_matrix_merges_multipart_polygons():
    """A GT building annotated as SEVERAL polygons must match a detection
    covering the whole building at the full IoU (annotation_to_rle merges
    parts; taking part [0] would halve the scoring model's IoU target)."""
    from mapping_tpu.scoring import _gt_iou_matrix

    h = w = 32
    layer = np.zeros((h, w), np.int32)
    layer[8:16, 4:28] = 1  # detection: the full building
    # GT: same building split into two abutting polygon parts
    left = [4.0, 8.0, 15.0, 8.0, 15.0, 15.0, 4.0, 15.0]
    right = [16.0, 8.0, 27.0, 8.0, 27.0, 15.0, 16.0, 15.0]
    ann = {"segmentation": [left, right]}
    iou = _gt_iou_matrix(layer, [ann])
    assert iou is not None and iou.shape == (1, 1)
    assert iou[0, 0] > 0.85  # merged parts ~ full detection
