"""Augmentation geometric parity vs scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from mapping_tpu.data.augment import (_affine_grid, _sample, center_crop,
                                      pad_replicate)


def _warp(image, angle, tx, ty, order):
    h, w = image.shape[:2]
    src_y, src_x = _affine_grid(h, w, angle, tx, ty)
    return np.asarray(_sample(jnp.asarray(image), src_y, src_x, order))


def test_pure_rotation_matches_scipy():
    rng = np.random.RandomState(0)
    img = rng.rand(33, 33, 1).astype(np.float32)
    for angle in (7.0, -10.0):
        ours = _warp(img, angle, 0.0, 0.0, order=1)[..., 0]
        # scipy rotate: CCW positive, about the center, bilinear, cval 0
        expected = ndimage.rotate(img[..., 0], angle, reshape=False, order=1,
                                  mode="constant", cval=0.0)
        inside = expected > 1e-6  # boundary rows differ by clamping details
        err = np.abs(ours - expected)[inside]
        assert np.percentile(err, 95) < 0.02, np.percentile(err, 95)


def test_pure_translation_is_exact_shift():
    rng = np.random.RandomState(1)
    img = rng.rand(40, 40, 2).astype(np.float32)
    ours = _warp(img, 0.0, 0.25, 0.0, order=0)  # shift right by 10 px
    np.testing.assert_allclose(ours[:, 10:], img[:, :-10], atol=1e-6)
    assert np.abs(ours[:, :10]).max() == 0  # cval 0 fill


def test_nearest_sampling_preserves_labels():
    labels = np.zeros((32, 32, 1), np.float32)
    labels[8:20, 8:20] = 3.0
    out = _warp(labels, 9.0, 0.05, -0.05, order=0)
    assert set(np.unique(out)) <= {0.0, 3.0}


def test_pad_replicate_matches_numpy_edge():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 5, 6, 3).astype(np.float32)
    ours = np.asarray(pad_replicate(jnp.asarray(x), (2, 3)))
    expected = np.pad(x, ((0, 0), (2, 2), (3, 3), (0, 0)), mode="edge")
    np.testing.assert_array_equal(ours, expected)


def test_pad_reflect_matches_cv2_border_reflect_101():
    """The reference PadFixed 'reflect' mode is cv2.BORDER_REFLECT_101
    (src/augmentation.py:46-54,74); asymmetric fixture so h/w swaps fail."""
    import cv2

    from mapping_tpu.data.augment import pad_reflect

    rng = np.random.RandomState(7)
    x = rng.randint(0, 255, (1, 5, 9, 3)).astype(np.float32)
    ours = np.asarray(pad_reflect(jnp.asarray(x), (3, 2)))[0]
    expected = cv2.copyMakeBorder(x[0], 3, 3, 2, 2, cv2.BORDER_REFLECT_101)
    np.testing.assert_array_equal(ours, expected)


def test_pad_fixed_dispatch_and_unknown_method():
    import pytest

    from mapping_tpu.data.augment import pad_fixed

    x = jnp.arange(24, dtype=jnp.float32).reshape(1, 2, 4, 3)
    np.testing.assert_array_equal(
        np.asarray(pad_fixed(x, (1, 1), "replicate")),
        np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"))
    np.testing.assert_array_equal(
        np.asarray(pad_fixed(x, (1, 1), "reflect")),
        np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)),
               mode="reflect"))
    with pytest.raises(ValueError, match="pad_method"):
        pad_fixed(x, (1, 1), "wrap")


def test_loader_pad_method_reflect_changes_padded_inference():
    """`pad_method: reflect` must actually flow config -> loader ->
    _infer_batch_pad and change the padded-mode input transform (it used
    to be an accepted knob that silently served replicate padding)."""
    import cv2

    from mapping_tpu.config import build_config
    from mapping_tpu.constants import MEAN, STD
    from mapping_tpu.data.loader import SegmentationLoader

    cfg = build_config(overrides={"pad_method": "reflect"})
    assert cfg.loader.pad_method == "reflect"
    rng = np.random.RandomState(11)
    batch = rng.randint(0, 255, (2, 12, 16, 3)).astype(np.uint8)

    out_r = np.asarray(SegmentationLoader(
        mode="crop_and_pad", pad=(4, 3),
        pad_method="reflect").infer_preprocess(batch))
    out_e = np.asarray(SegmentationLoader(
        mode="crop_and_pad", pad=(4, 3),
        pad_method="replicate").infer_preprocess(batch))
    assert not np.array_equal(out_r, out_e)

    # oracle: cv2 BORDER_REFLECT_101 pad then ImageNet normalize
    mean = np.asarray(MEAN, np.float32)
    std = np.asarray(STD, np.float32)
    for i in range(batch.shape[0]):
        padded = cv2.copyMakeBorder(batch[i], 4, 4, 3, 3,
                                    cv2.BORDER_REFLECT_101)
        expected = (padded.astype(np.float32) / 255.0 - mean) / std
        np.testing.assert_allclose(out_r[i], expected, atol=1e-6)


def test_loader_rejects_unknown_pad_method():
    import pytest

    from mapping_tpu.data.loader import SegmentationLoader

    with pytest.raises(ValueError, match="pad_method"):
        SegmentationLoader(mode="crop_and_pad", pad_method="mirror")


def test_center_crop_inverts_pad():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 10, 12, 1).astype(np.float32)
    padded = pad_replicate(jnp.asarray(x), (4, 5))
    cropped = np.asarray(center_crop(padded, (10, 12)))
    np.testing.assert_array_equal(cropped, x)
