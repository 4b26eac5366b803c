"""Target-preparation tests vs scipy oracles (SURVEY.md §4 rebuild plan:
distance/size formula parity with src/preparation.py:151-195)."""

import numpy as np
import pytest
from scipy import ndimage

from mapping_tpu.prep import prepare_image_targets


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r**2).astype(np.uint8)


def _oracle_distances(masks, h, w):
    """Reference update/clean_distances: stack per-object EDTs, keep two
    smallest per pixel, sum."""
    if not masks:
        return np.zeros((h, w), np.float32)
    stack = np.stack([ndimage.distance_transform_edt(1 - m) for m in masks], -1)
    if stack.shape[-1] == 1:
        return 2 * stack[..., 0]
    stack.sort(axis=-1)
    return stack[..., 0] + stack[..., 1]


def test_distances_match_scipy_top2():
    h = w = 48
    masks = [_disk(h, w, 12, 12, 5), _disk(h, w, 30, 34, 7), _disk(h, w, 40, 10, 4)]
    out = prepare_image_targets(masks, (h, w))
    expected = _oracle_distances(masks, h, w)
    np.testing.assert_allclose(
        np.asarray(out["distances"], np.float32), expected.astype(np.float16).astype(np.float32),
        atol=0.05, rtol=1e-3)


def test_single_object_distance_doubled():
    h = w = 32
    masks = [_disk(h, w, 16, 16, 5)]
    out = prepare_image_targets(masks, (h, w))
    expected = _oracle_distances(masks, h, w)
    np.testing.assert_allclose(np.asarray(out["distances"], np.float32),
                               expected.astype(np.float16).astype(np.float32),
                               atol=0.05, rtol=1e-3)


def test_mask_and_sizes():
    h = w = 48
    m1, m2 = _disk(h, w, 12, 12, 5), _disk(h, w, 34, 34, 6)
    out = prepare_image_targets([m1, m2], (h, w))
    assert (out["mask"] == ((m1 | m2) > 0)).all()
    labeled, _ = ndimage.label(out["mask"])
    for lbl in range(1, labeled.max() + 1):
        sel = labeled == lbl
        assert (out["sizes"][sel] == sel.sum()).all()
    assert (out["sizes"][out["mask"] == 0] == 1).all()


def test_border_object_dropped():
    h = w = 32
    border_obj = np.zeros((h, w), np.uint8)
    border_obj[0:2, :] = 1  # only in the 2px border -> dropped
    inner = _disk(h, w, 16, 16, 4)
    out = prepare_image_targets([border_obj, inner], (h, w))
    assert (out["mask"] == inner).all()


def test_erosion_spares_small_objects():
    h = w = 48
    big = _disk(h, w, 16, 16, 10)
    small = _disk(h, w, 38, 38, 3)  # area < 14^2
    out = prepare_image_targets([big, small], (h, w), erode=3)
    got = out["mask"].astype(bool)
    assert (got & small.astype(bool)).sum() == small.sum()  # untouched
    assert (got & big.astype(bool)).sum() < big.sum()  # eroded


def test_fully_eroded_object_restored():
    h = w = 64
    # area just over the small-object limit but thin -> fully erased by erosion
    thin = np.zeros((h, w), np.uint8)
    thin[30:32, 10:110 - 10] = 1  # 2x44 = 88 pixels... below 196, boost width
    thin2 = np.zeros((h, w), np.uint8)
    thin2[20:24, 5:55] = 1  # 4x50 = 200 px > 196, erode 5 kills a 4px band
    out = prepare_image_targets([thin2], (h, w), erode=5)
    assert (out["mask"].astype(bool) == thin2.astype(bool)).all()


def test_empty_annotations():
    out = prepare_image_targets([], (16, 16))
    assert out["mask"].sum() == 0
    assert out["distances"].sum() == 0
    assert (out["sizes"] == 1).all()
