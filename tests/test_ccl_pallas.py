"""Pallas CCL kernel vs scipy oracle (interpret mode on the CPU backend)."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from mapping_tpu.ops.ccl import _renumber
from mapping_tpu.ops.ccl_pallas import label_raw_pallas


def _cases():
    rng = np.random.RandomState(0)
    rects = np.zeros((2, 48, 48), bool)
    for b in range(2):
        for _ in range(6):
            y, x = rng.randint(0, 38, 2)
            h, w = rng.randint(3, 12, 2)
            rects[b, y:y + h, x:x + w] = True
    noise = rng.rand(1, 48, 48) > 0.55
    spiral = np.zeros((1, 32, 32), bool)
    spiral[0, 2, 2:30] = True
    spiral[0, 2:30, 29] = True
    spiral[0, 29, 4:30] = True
    spiral[0, 6:30, 4] = True
    spiral[0, 6, 4:26] = True
    return [rects, noise, spiral,
            np.zeros((1, 16, 16), bool), np.ones((1, 16, 16), bool)]


@pytest.mark.parametrize("case_idx", range(5))
def test_pallas_ccl_matches_scipy(case_idx):
    m = _cases()[case_idx]
    labels = np.asarray(_renumber(
        label_raw_pallas(jnp.asarray(m), interpret=True)))
    for b in range(m.shape[0]):
        expected, n = ndimage.label(m[b])
        np.testing.assert_array_equal(labels[b], expected)


@pytest.mark.parametrize("case_idx", range(5))
def test_pallas_fused_renumber_matches_scipy(case_idx):
    """label_pallas fuses renumbering into the kernel (root-rank propagation,
    no host gather); must match scipy.ndimage.label exactly."""
    from mapping_tpu.ops.ccl_pallas import label_pallas

    m = _cases()[case_idx]
    labels = np.asarray(label_pallas(jnp.asarray(m), interpret=True))
    for b in range(m.shape[0]):
        expected, n = ndimage.label(m[b])
        np.testing.assert_array_equal(labels[b], expected)


def test_pallas_fused_renumber_fuzz():
    rng = np.random.RandomState(7)
    m = rng.rand(4, 64, 64) > 0.6
    from mapping_tpu.ops.ccl_pallas import label_pallas

    labels = np.asarray(label_pallas(jnp.asarray(m), interpret=True))
    for b in range(4):
        expected, _ = ndimage.label(m[b])
        np.testing.assert_array_equal(labels[b], expected)
