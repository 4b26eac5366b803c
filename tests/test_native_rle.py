"""C++ kernel tests: instance-RLE extractor vs the numpy oracle."""

import numpy as np
import pytest

from mapping_tpu.ops import rle as rle_ops
from mapping_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.build():
        pytest.skip("C++ toolchain unavailable")


def _random_labels(h, w, n, seed):
    rng = np.random.RandomState(seed)
    labels = np.zeros((h, w), np.int32)
    for i in range(1, n + 1):
        y, x = rng.randint(0, h - 8), rng.randint(0, w - 8)
        hh, ww = rng.randint(2, 8, 2)
        labels[y:y + hh, x:x + ww] = i
    return labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_instances_match_numpy_encode(seed):
    labels = _random_labels(37, 53, 6, seed)
    packed = native.rle_instances(labels, 6)
    for i, (counts, bbox) in enumerate(packed, start=1):
        mask = (labels == i).astype(np.uint8)
        expected = rle_ops.encode(mask)
        assert counts == expected["counts"], f"instance {i}"
        assert bbox == rle_ops.to_bbox(expected)


def test_empty_instance():
    labels = np.zeros((10, 10), np.int32)
    labels[2:4, 2:4] = 2  # instance 1 absent
    packed = native.rle_instances(labels, 2)
    c1, b1 = packed[0]
    assert rle_ops.decode({"size": [10, 10], "counts": c1}).sum() == 0
    c2, _ = packed[1]
    assert rle_ops.decode({"size": [10, 10], "counts": c2}).sum() == 4


def test_full_coverage_roundtrip():
    rng = np.random.RandomState(3)
    labels = (rng.rand(64, 64) * 4).astype(np.int32)  # dense labels 0..3
    packed = native.rle_instances(labels, 3)
    for i, (counts, _) in enumerate(packed, start=1):
        mask = rle_ops.decode({"size": [64, 64], "counts": counts})
        np.testing.assert_array_equal(mask, (labels == i).astype(np.uint8))


def test_string_codec_roundtrip_cpp():
    counts = [0, 5, 3, 2, 100, 1, 4000]
    s = native.counts_to_string(counts)
    assert native.string_to_counts(s) == counts
    # parity with numpy impl
    import mapping_tpu.ops.rle as R

    # force numpy path by calling the pure-python branch directly
    py = bytearray()
    cs = [int(c) for c in counts]
    for i, x in enumerate(cs):
        if i > 2:
            x -= cs[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            py.append(c + 48)
    assert s == bytes(py)


def test_rle_handle_area_matches_decoded_mask():
    """RleHandle.area (vectorized odd-run sum over the ctypes buffer) equals
    the decoded mask's pixel count, including empty and full masks."""
    rng = np.random.RandomState(11)
    masks = [np.zeros((13, 9), np.uint8),
             np.ones((13, 9), np.uint8),
             (rng.rand(13, 9) > 0.5).astype(np.uint8)]
    for mask in masks:
        counts = rle_ops.encode(mask)["counts"]
        h = native.RleHandle(counts)
        assert h.area == int(mask.sum())
