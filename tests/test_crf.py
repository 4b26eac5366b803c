"""CRF refinement tests: denoising toward image edges (reference dense_crf
semantics, src/postprocessing.py:183-225)."""

import jax.numpy as jnp
import numpy as np

from mapping_tpu.ops.crf import dense_crf, dense_crf_batch


def _scene(h=48, w=48, seed=0):
    rng = np.random.RandomState(seed)
    image = np.full((h, w, 3), 0.2, np.float32)
    gt = np.zeros((h, w), np.int32)
    image[10:35, 12:40] = 0.9  # bright building
    gt[10:35, 12:40] = 1
    noisy = np.where(gt == 1, 0.8, 0.2) + rng.randn(h, w) * 0.25
    fg = np.clip(noisy, 0.02, 0.98).astype(np.float32)
    probs = np.stack([1 - fg, fg], -1)
    return image, probs, gt


def test_crf_improves_noisy_unary():
    image, probs, gt = _scene()
    refined = np.asarray(dense_crf(jnp.asarray(image), jnp.asarray(probs)))
    before = ((probs[..., 1] > 0.5) == gt).mean()
    after = ((refined[..., 1] > 0.5) == gt).mean()
    assert after >= before
    assert after > 0.97


def test_crf_preserves_probability_simplex():
    image, probs, _ = _scene(seed=1)
    refined = np.asarray(dense_crf(jnp.asarray(image), jnp.asarray(probs),
                                   iterations=3))
    np.testing.assert_allclose(refined.sum(-1), 1.0, atol=1e-4)
    assert refined.min() >= 0


def test_crf_batch():
    image, probs, _ = _scene(seed=2)
    out = dense_crf_batch(jnp.asarray(image[None]), jnp.asarray(probs[None]),
                          iterations=2)
    assert out.shape == (1, 48, 48, 2)
