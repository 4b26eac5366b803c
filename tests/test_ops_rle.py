"""RLE codec round-trips, bbox/area/IoU invariants, and (when built) the C++
fast path vs the numpy oracle."""

import numpy as np
import pytest

from mapping_tpu.ops import rle


def random_mask(seed, h=30, w=25, p=0.7):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w) > p).astype(np.uint8)


@pytest.mark.parametrize("seed", range(5))
def test_encode_decode_roundtrip(seed):
    m = random_mask(seed)
    r = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(r), m)


def test_counts_string_roundtrip():
    for counts in ([0, 5, 3, 2], [10], [0], [7, 1, 1, 1, 600000, 3]):
        s = rle.counts_to_string(counts)
        assert rle.string_to_counts(s) == counts


def test_known_string_format():
    # 3x3 all-ones mask: counts [0, 9]
    m = np.ones((3, 3), dtype=np.uint8)
    r = rle.encode(m)
    assert rle.string_to_counts(r["counts"]) == [0, 9]
    assert rle.area(r) == 9
    assert rle.to_bbox(r) == [0.0, 0.0, 3.0, 3.0]


def test_area_and_bbox():
    m = np.zeros((20, 20), dtype=np.uint8)
    m[3:9, 5:12] = 1
    r = rle.encode(m)
    assert rle.area(r) == 6 * 7
    assert rle.to_bbox(r) == [5.0, 3.0, 7.0, 6.0]


def test_iou_identity_and_disjoint():
    a = rle.encode(random_mask(0))
    m2 = random_mask(0)
    m3 = 1 - m2
    b = rle.encode(m2)
    c = rle.encode(m3.astype(np.uint8))
    mat = rle.iou([a], [b, c], [0, 0])
    np.testing.assert_allclose(mat[0, 0], 1.0)
    np.testing.assert_allclose(mat[0, 1], 0.0)


def test_iou_crowd_semantics():
    dt = np.zeros((10, 10), dtype=np.uint8)
    dt[0:5, 0:5] = 1  # area 25
    gt = np.ones((10, 10), dtype=np.uint8)  # area 100, covers dt
    r_dt, r_gt = rle.encode(dt), rle.encode(gt)
    normal = rle.iou([r_dt], [r_gt], [0])[0, 0]
    crowd = rle.iou([r_dt], [r_gt], [1])[0, 0]
    np.testing.assert_allclose(normal, 25 / 100)
    np.testing.assert_allclose(crowd, 1.0)  # inter / dt_area


def test_merge_union():
    m1, m2 = random_mask(1), random_mask(2)
    merged = rle.merge([rle.encode(m1), rle.encode(m2)])
    np.testing.assert_array_equal(rle.decode(merged), (m1 | m2))


def test_polygon_rasterization_square():
    # a 10x10 axis-aligned square polygon
    poly = [2, 3, 12, 3, 12, 13, 2, 13]
    r = rle.from_polygons([poly], 20, 20)[0]
    m = rle.decode(r)
    # interior must be filled, far exterior empty
    assert m[5, 5] == 1 and m[12, 11] == 1
    assert m[0, 0] == 0 and m[19, 19] == 0
    area = rle.area(r)
    assert 95 <= area <= 125  # ~11x11 with boundary convention slack


def test_native_matches_numpy_if_built():
    from mapping_tpu.utils import native

    if not native.build():
        pytest.skip("C++ toolchain unavailable")
    counts = [0, 7, 3, 2, 100000, 5]
    assert native.string_to_counts(rle.counts_to_string(counts)) == counts
    # IoU parity on random masks
    dts = [rle.encode(random_mask(s)) for s in range(3)]
    gts = [rle.encode(random_mask(s + 10)) for s in range(4)]
    ref = rle.iou.__wrapped__(dts, gts, [0, 0, 1, 0]) if hasattr(rle.iou, "__wrapped__") else None
    got = native.rle_iou(dts, gts, [0, 0, 1, 0])
    # numpy path, forced
    import mapping_tpu.ops.rle as rmod
    saved = rmod._native
    rmod._native = None
    try:
        expect = rle.iou(dts, gts, [0, 0, 1, 0])
    finally:
        rmod._native = saved
    np.testing.assert_allclose(got, expect, atol=1e-9)
