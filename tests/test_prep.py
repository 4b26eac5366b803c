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


def test_prepare_device_batch_matches_per_image():
    """Batched target preparation (one dispatch per image batch) must equal
    the per-image program, including erosion/restore rules."""
    import jax.numpy as jnp

    from mapping_tpu.prep.targets import _prepare_device, _prepare_device_batch

    rng = np.random.RandomState(4)
    b, n, h, w = 3, 8, 48, 48
    stack = np.zeros((b, n, h, w), bool)
    valid = np.zeros((b, n), bool)
    for i in range(b):
        n_real = rng.randint(1, n + 1)
        for j in range(n_real):
            y, x = rng.randint(0, h - 10, 2)
            hh, ww = rng.randint(2, 10, 2)
            stack[i, j, y:y+hh, x:x+ww] = True
        valid[i, :n_real] = True

    for erode, dilate in ((0, 0), (2, 0), (2, 1)):
        mb, db, sb, zb = _prepare_device_batch(
            jnp.asarray(stack), jnp.asarray(valid), erode, dilate, 3, 2)
        for i in range(b):
            m1, d1, s1, z1 = _prepare_device(
                jnp.asarray(stack[i]), jnp.asarray(valid[i]), erode, dilate,
                3, 2)
            np.testing.assert_array_equal(np.asarray(mb[i]), np.asarray(m1))
            np.testing.assert_allclose(np.asarray(db[i]), np.asarray(d1),
                                       rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(zb[i]), np.asarray(z1))
