"""Morphology / resize / EDT / instance reductions vs host oracles."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from mapping_tpu.ops.morphology import erode, dilate
from mapping_tpu.ops.resize import resize_hw
from mapping_tpu.ops.edt import edt, distance_stack_top2
from mapping_tpu.ops import instance as inst


# -- morphology ------------------------------------------------------------

def _ref_erode(img, k):
    # skimage.morphology.erosion(img, rectangle(k, k)) delegates to exactly
    # this call (footprint of ones, default origin)
    return ndi.grey_erosion(img, footprint=np.ones((k, k)), mode="reflect")


def _ref_dilate(img, k):
    return ndi.grey_dilation(img, footprint=np.ones((k, k)), mode="reflect")


@pytest.mark.parametrize("k", [2, 3, 5])
def test_erode_dilate_binary(k):
    rng = np.random.RandomState(0)
    m = (rng.rand(40, 40) > 0.5).astype(np.int32)
    # interior comparison (border handling differs: we pad with +/-inf i.e.
    # 'constant'; skimage pads with edge values — equal away from border)
    ours_e = np.asarray(erode(m, k))[k:-k, k:-k]
    ref_e = _ref_erode(m, k)[k:-k, k:-k]
    np.testing.assert_array_equal(ours_e, ref_e)
    ours_d = np.asarray(dilate(m, k))[k:-k, k:-k]
    ref_d = _ref_dilate(m, k)[k:-k, k:-k]
    np.testing.assert_array_equal(ours_d, ref_d)


def test_erode_noop():
    m = np.arange(16).reshape(4, 4)
    np.testing.assert_array_equal(np.asarray(erode(m, 0)), m)
    np.testing.assert_array_equal(np.asarray(dilate(m, 0)), m)


def test_labeled_dilation_is_maxfilter():
    # dilate_image runs on labeled (int) masks in the reference
    labels = np.zeros((10, 10), dtype=np.int32)
    labels[2, 2] = 1
    labels[5, 5] = 2
    d = np.asarray(dilate(labels, 3))
    assert d[2, 3] == 1 and d[4, 4] == 2


# -- resize ------------------------------------------------------------------

def test_resize_constant_field():
    img = np.full((2, 64, 64), 0.7, dtype=np.float32)
    out = np.asarray(resize_hw(img, (300, 300)))
    assert out.shape == (2, 300, 300)
    np.testing.assert_allclose(out, 0.7, atol=1e-6)


def test_resize_matches_skimage_semantics():
    # no skimage in the image; verify against scipy.ndimage.zoom with the
    # half-pixel-center convention via direct coordinate evaluation
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32).astype(np.float32)
    out = np.asarray(resize_hw(img, (75, 75)))
    # sample a few points with manual bilinear interpolation
    scale = 32 / 75
    for (oy, ox) in [(0, 0), (37, 37), (74, 74), (10, 60)]:
        sy = (oy + 0.5) * scale - 0.5
        sx = (ox + 0.5) * scale - 0.5
        y0, x0 = int(np.floor(np.clip(sy, 0, 31))), int(np.floor(np.clip(sx, 0, 31)))
        y1, x1 = min(y0 + 1, 31), min(x0 + 1, 31)
        wy, wx = np.clip(sy, 0, 31) - y0, np.clip(sx, 0, 31) - x0
        ref = (img[y0, x0] * (1 - wy) * (1 - wx) + img[y0, x1] * (1 - wy) * wx
               + img[y1, x0] * wy * (1 - wx) + img[y1, x1] * wy * wx)
        assert abs(out[oy, ox] - ref) < 1e-4


# -- EDT ---------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1])
def test_edt_matches_scipy(seed):
    rng = np.random.RandomState(seed)
    m = (rng.rand(40, 40) > 0.9).astype(np.uint8)
    if m.sum() == 0:
        m[5, 5] = 1
    ours = np.asarray(edt(m))
    # reference usage: distance_transform_edt(1 - mask): distance to mask
    ref = ndi.distance_transform_edt(1 - m)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_edt_empty_mask():
    m = np.zeros((16, 16), dtype=np.uint8)
    ours = np.asarray(edt(m))
    assert np.all(ours > 15)  # effectively "infinite"


def test_distance_stack_top2():
    # three object distance maps; verify sum of two smallest and second-min
    d = np.stack([
        np.full((4, 4), 1.0),
        np.full((4, 4), 3.0),
        np.full((4, 4), 2.0),
    ]).astype(np.float32)
    valid = np.array([True, True, True])
    s, second = distance_stack_top2(d, valid)
    np.testing.assert_allclose(np.asarray(s), 3.0)
    np.testing.assert_allclose(np.asarray(second), 2.0)
    # one object: duplicated
    valid1 = np.array([True, False, False])
    s1, second1 = distance_stack_top2(d, valid1)
    np.testing.assert_allclose(np.asarray(s1), 2.0)
    np.testing.assert_allclose(np.asarray(second1), 1.0)
    # zero objects: zeros
    s0, second0 = distance_stack_top2(d, np.zeros(3, bool))
    np.testing.assert_allclose(np.asarray(s0), 0.0)


# -- instance reductions -------------------------------------------------------

def test_instance_scores_match_reference_formula():
    labels = np.zeros((8, 8), dtype=np.int32)
    labels[0:2, 0:2] = 1  # area 4
    labels[4:7, 4:7] = 2  # area 9
    probs = np.linspace(0, 1, 64).reshape(8, 8).astype(np.float32)
    scores, areas = inst.instance_scores(labels, probs, max_instances=4)
    scores, areas = np.asarray(scores), np.asarray(areas)
    for lbl in (1, 2):
        m = labels == lbl
        ref = probs[m].mean() * np.sqrt(m.sum())
        np.testing.assert_allclose(scores[lbl - 1], ref, rtol=1e-5)
        assert areas[lbl - 1] == m.sum()
    assert scores[2] == 0 and areas[2] == 0


def test_size_matrix():
    labels = np.zeros((6, 6), dtype=np.int32)
    labels[0:3, 0:2] = 1
    sm = np.asarray(inst.size_matrix(labels, max_instances=4))
    assert sm[0, 0] == 6
    assert sm[5, 5] == 1  # background = 1 (src/preparation.py:190)


def test_instance_bboxes():
    labels = np.zeros((10, 12), dtype=np.int32)
    labels[2:5, 3:9] = 1
    boxes = np.asarray(inst.instance_bboxes(labels, max_instances=2))
    np.testing.assert_array_equal(boxes[0], [2, 5, 3, 9])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])


def test_instance_areas_and_prob_sums_dense_matches_scatter():
    """Dense one-hot matmul reductions vs the segment_sum oracle: areas exact,
    prob sums to ~1e-6 (bf16 hi/lo split)."""
    rng = np.random.RandomState(3)
    import jax.numpy as jnp

    labels = jnp.asarray(rng.randint(0, 9, (3, 40, 40)).astype(np.int32))
    probs = jnp.asarray(rng.rand(3, 40, 40).astype(np.float32))
    areas, sums = inst.instance_areas_and_prob_sums(labels, probs, 8)
    for b in range(3):
        a_ref = np.asarray(inst.instance_areas(labels[b], 8))
        s_ref = np.asarray(inst.instance_prob_sums(labels[b], probs[b], 8))
        np.testing.assert_array_equal(np.asarray(areas[b]), a_ref)
        np.testing.assert_allclose(np.asarray(sums[b]), s_ref, rtol=3e-6,
                                   atol=1e-5)


def test_instance_feature_tensor_matches_host_oracle():
    """Device feature tensor vs scoring.features_for_mask (the reference's
    per-instance host loop, src/postprocessing.py:286-303)."""
    import jax.numpy as jnp
    from mapping_tpu.scoring import features_for_mask

    rng = np.random.RandomState(5)
    h = w = 60
    masks = np.zeros((2, h, w), np.int32)
    for b in range(2):
        lab = 1
        for _ in range(6):
            y, x = rng.randint(0, h - 12, 2)
            hh, ww = rng.randint(2, 12, 2)
            masks[b, y:y+hh, x:x+ww] = lab
            lab += 1
    probs = rng.rand(2, h, w).astype(np.float32)
    feats = np.asarray(inst.instance_feature_tensor(
        jnp.asarray(masks), jnp.asarray(probs), 16))
    for b in range(2):
        for label in range(1, masks[b].max() + 1):
            sel = masks[b] == label
            if not sel.any():
                assert np.all(feats[b, label - 1] == 0)
                continue
            ref = features_for_mask(sel, probs[b], threshold=0.5)
            got = feats[b, label - 1]
            np.testing.assert_allclose(got[0], ref["area"])
            np.testing.assert_allclose(got[1], ref["mean_prob"], rtol=1e-5)
            np.testing.assert_allclose(got[2], ref["max_prob"], rtol=1e-6)
            np.testing.assert_allclose(got[3], ref["bbox_ar"], rtol=1e-6)
            np.testing.assert_allclose(got[4], ref["bbox_area"])
            np.testing.assert_allclose(got[5], ref["bbox_fill"], rtol=1e-6)
            np.testing.assert_allclose(got[6], ref["min_dist_to_border"])
            np.testing.assert_allclose(got[7], ref["max_dist_to_border"])
            np.testing.assert_allclose(got[8], ref["contour_length"])
