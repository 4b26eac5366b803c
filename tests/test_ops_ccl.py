"""Connected-component labeling vs the scipy.ndimage.label oracle
(the reference's implementation, src/utils.py:328-330)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from mapping_tpu.ops.ccl import connected_components, num_components


def _check(mask):
    ours = np.asarray(connected_components(mask))
    ref, n_ref = ndi.label(mask)
    assert ours.max() == n_ref
    # same partition AND same numbering (both order components by first
    # row-major pixel)
    np.testing.assert_array_equal(ours, ref)


def test_empty():
    _check(np.zeros((16, 16), dtype=np.uint8))


def test_full():
    _check(np.ones((16, 16), dtype=np.uint8))


def test_two_blocks():
    m = np.zeros((20, 20), dtype=np.uint8)
    m[2:5, 2:5] = 1
    m[10:15, 10:18] = 1
    _check(m)


def test_diagonal_not_connected():
    # 4-connectivity: diagonal touching pixels are separate components
    m = np.zeros((8, 8), dtype=np.uint8)
    m[2, 2] = 1
    m[3, 3] = 1
    _check(m)


def test_spiral():
    # worst case for sweep propagation: a spiral arm
    m = np.zeros((32, 32), dtype=np.uint8)
    m[2, 2:30] = 1
    m[2:30, 29] = 1
    m[29, 6:30] = 1
    m[8:30, 6] = 1
    m[8, 6:24] = 1
    _check(m)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random(seed):
    rng = np.random.RandomState(seed)
    m = (rng.rand(48, 48) > 0.6).astype(np.uint8)
    _check(m)


def test_batched():
    rng = np.random.RandomState(3)
    m = (rng.rand(4, 32, 32) > 0.55).astype(np.uint8)
    ours = np.asarray(connected_components(m))
    for b in range(4):
        ref, n = ndi.label(m[b])
        np.testing.assert_array_equal(ours[b], ref)
    counts = np.asarray(num_components(connected_components(m)))
    for b in range(4):
        _, n = ndi.label(m[b])
        assert counts[b] == n
