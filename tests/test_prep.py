"""Target-preparation tests vs scipy oracles (SURVEY.md §4 rebuild plan:
distance/size formula parity with src/preparation.py:151-195)."""

import os

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


def _rect(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def test_chunked_path_matches_single_chunk(monkeypatch):
    """>MAX_OBJECTS images take the host-merged chunked path; its outputs
    must be IDENTICAL to the single-chunk device program on the same
    annotations — including when one chunk's objects are all filtered
    (border-only) and when a chunk holds a single valid object, the cases
    where per-chunk clamps would poison a naive merge."""
    import mapping_tpu.prep.targets as tg

    h = w = 48
    rng = np.random.RandomState(3)
    masks = []
    for _ in range(14):
        y, x = rng.randint(4, h - 8), rng.randint(4, w - 8)
        masks.append(_rect(h, w, y, y + 4, x, x + 4))
    # chunk-sized run of border-only objects (filtered by _interior_empty):
    # with MAX_OBJECTS=8 these land in one all-invalid chunk
    for k in range(4):
        m = np.zeros((h, w), np.uint8)
        m[0, 10 + k] = 1
        masks.append(m)

    want = tg.prepare_image_targets(masks, (h, w), border_width=4)
    monkeypatch.setattr(tg, "MAX_OBJECTS", 8)
    got = tg.prepare_image_targets(masks, (h, w), border_width=4)

    np.testing.assert_array_equal(got["mask"], want["mask"])
    np.testing.assert_allclose(np.asarray(got["distances"], np.float32),
                               np.asarray(want["distances"], np.float32),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_array_equal(got["sizes"], want["sizes"])
    # sanity vs the scipy oracle too (kept objects only)
    oracle = _oracle_distances(masks[:14], h, w)
    np.testing.assert_allclose(np.asarray(got["distances"], np.float32),
                               oracle, rtol=1e-3, atol=0.5)


def test_chunked_single_valid_object(monkeypatch):
    """One valid object spread over chunk boundaries of invalid ones:
    the global clamp (second := nearest) must use the GLOBAL valid count,
    not any chunk's."""
    import mapping_tpu.prep.targets as tg

    h = w = 32
    masks = [_rect(h, w, 10, 14, 10, 14)]
    for k in range(11):  # border-only fillers across 3 chunks
        m = np.zeros((h, w), np.uint8)
        m[0, 5 + k] = 1
        masks.append(m)
    want = tg.prepare_image_targets(masks, (h, w))
    monkeypatch.setattr(tg, "MAX_OBJECTS", 4)
    got = tg.prepare_image_targets(masks, (h, w))
    np.testing.assert_allclose(np.asarray(got["distances"], np.float32),
                               np.asarray(want["distances"], np.float32),
                               rtol=1e-3, atol=1e-2)
    # single valid object: distances = 2 * its EDT (oracle)
    oracle = _oracle_distances([masks[0]], h, w)
    np.testing.assert_allclose(np.asarray(got["distances"], np.float32),
                               oracle, rtol=1e-3, atol=0.5)


def _coco_json(path, size, objects):
    """objects: list of (category_id, mask). Writes a minimal COCO json."""
    import json

    from mapping_tpu.ops import rle as rle_ops

    h, w = size
    cats = sorted({c for c, _ in objects})
    anns = []
    for i, (cid, m) in enumerate(objects, start=1):
        enc = rle_ops.encode(m.astype(np.uint8))
        counts = enc["counts"]
        anns.append({
            "id": i, "image_id": 1, "category_id": cid,
            "segmentation": {"size": [h, w],
                             "counts": counts.decode("utf-8")
                             if isinstance(counts, bytes) else counts},
            "area": int(m.sum()), "iscrowd": 0,
            "bbox": rle_ops.to_bbox(enc),
        })
    doc = {"images": [{"id": 1, "file_name": "tile_1.png",
                       "height": h, "width": w}],
           "annotations": anns,
           "categories": [{"id": c, "name": f"c{c}"} for c in cats]}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f)


def _read_artifacts(target_dir, dataset, stem="tile_1"):
    import joblib
    from PIL import Image

    mask = np.asarray(Image.open(
        os.path.join(target_dir, dataset, "masks", stem + ".png")))
    dist = np.asarray(joblib.load(
        os.path.join(target_dir, dataset, "distances", stem)))
    sizes = np.asarray(joblib.load(
        os.path.join(target_dir, dataset, "sizes", stem)))
    return mask, dist, sizes


def test_overlay_masks_preserves_border_class(tmp_path):
    """border_width > 0: the written mask png keeps the border as class
    category_nr+1 (reference borders_class_id = mask.max()+1,
    src/preparation.py:83-86) — flattening it into the building class
    would label the separating band between touching buildings as
    building."""
    from mapping_tpu.prep import overlay_masks

    h = w = 48
    a = _rect(h, w, 10, 20, 10, 22)
    b = _rect(h, w, 10, 20, 26, 38)  # 4px gap from a
    data_dir = str(tmp_path / "data")
    _coco_json(os.path.join(data_dir, "train", "annotation.json"),
               (h, w), [(100, a), (100, b)])
    target_dir = str(tmp_path / "targets")
    overlay_masks(data_dir, "train", target_dir, [None, 100],
                  border_width=4)
    mask, dist, sizes = _read_artifacts(target_dir, "train")
    assert set(np.unique(mask)) == {0, 1, 2}
    # the gap band between the buildings is border
    assert (mask[12:18, 23:25] == 2).all()
    # buildings stay class 1
    assert (mask[12:18, 12:20] == 1).all()
    # distances: top-2 EDT sum over both objects
    oracle = _oracle_distances([a, b], h, w)
    np.testing.assert_allclose(dist.astype(np.float32), oracle,
                               rtol=1e-2, atol=0.5)


def test_overlay_masks_multicategory_accumulates(tmp_path):
    """Two real categories: distances/sizes accumulate over ALL objects of
    ALL categories (reference clean_distances runs once after the category
    loop, src/preparation.py:44-87); the border overlay runs once on the
    final labeled mask."""
    from mapping_tpu.prep import overlay_masks

    h = w = 48
    a = _rect(h, w, 8, 16, 8, 16)     # category 100 -> class 1
    b = _rect(h, w, 30, 40, 28, 40)   # category 200 -> class 2
    data_dir = str(tmp_path / "data")
    _coco_json(os.path.join(data_dir, "train", "annotation.json"),
               (h, w), [(100, a), (200, b)])
    target_dir = str(tmp_path / "targets")
    overlay_masks(data_dir, "train", target_dir, [None, 100, 200])
    mask, dist, sizes = _read_artifacts(target_dir, "train")
    assert (mask[a.astype(bool)] == 1).all()
    assert (mask[b.astype(bool)] == 2).all()
    # cross-category top-2: NOT just the last category's doubled EDT
    oracle = _oracle_distances([a, b], h, w)
    np.testing.assert_allclose(dist.astype(np.float32), oracle,
                               rtol=1e-2, atol=0.5)
    # sizes from the union mask CCL
    assert sizes[10, 10] == a.sum()
    assert sizes[35, 35] == b.sum()
