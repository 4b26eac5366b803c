"""Golden-value loss tests vs independent numpy/torch oracles
(SURVEY.md §4: loss math w0/sigma/C formulas, src/models.py:339-381)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mapping_tpu.train import (
    dice_loss,
    get_weights,
    make_loss_fn,
    mixed_dice_cross_entropy_loss,
    multiclass_dice_loss,
    multiclass_segmentation_loss,
    multiclass_weighted_cross_entropy,
)

RNG = np.random.RandomState(0)


def _np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_ce(logits, labels):
    p = _np_softmax(logits, -1)
    n, h, w, c = logits.shape
    flat = p.reshape(-1, c)
    picked = flat[np.arange(flat.shape[0]), labels.reshape(-1)]
    return -np.log(picked).reshape(n, h, w)


def test_plain_ce_matches_torch():
    torch = pytest.importorskip("torch")
    logits = RNG.randn(2, 8, 8, 3).astype(np.float32)
    labels = RNG.randint(0, 3, (2, 8, 8))
    ours = float(multiclass_segmentation_loss(jnp.asarray(logits), jnp.asarray(labels)))
    t = torch.nn.CrossEntropyLoss()(
        torch.tensor(np.transpose(logits, (0, 3, 1, 2))), torch.tensor(labels)
    )
    assert abs(ours - float(t)) < 1e-5


def test_distance_size_weight_formula():
    h = w = 16
    dist = RNG.rand(1, h, w).astype(np.float32) * 20
    dist[0, :4, :4] = 0  # inside objects
    sizes = RNG.randint(0, 200, (1, h, w)).astype(np.float32)
    sizes[0, 0, :] = 0
    sizes[0, 1, :] = 1
    stacked = np.stack([dist, sizes], axis=-1)

    w0, sigma = 50.0, 10.0
    c = np.sqrt(h * w) / 2
    dw = 1 + w0 * np.exp(-(dist**2) / sigma**2)
    dw[dist == 0] = 1
    s = sizes.copy()
    s[sizes == 0] = 1
    sw = c / s
    sw[s == 1] = 1
    expected = dw * sw

    got = np.asarray(get_weights(jnp.asarray(stacked), w0, sigma, (h, w)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_weighted_ce_golden():
    n, h, w, c = 2, 8, 8, 2
    logits = RNG.randn(n, h, w, c).astype(np.float32)
    mask = RNG.randint(0, c, (n, h, w)).astype(np.float32)
    dist = RNG.rand(n, h, w).astype(np.float32) * 10
    sizes = RNG.randint(1, 50, (n, h, w)).astype(np.float32)
    target = np.stack([mask, dist, sizes], axis=-1)

    def weights_fn(wc):
        return get_weights(wc, 50.0, 10.0, (h, w))

    ours = float(multiclass_weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(target), weights_fn))

    ce = _np_ce(logits, mask.astype(np.int64))
    cc = np.sqrt(h * w) / 2
    dw = 1 + 50.0 * np.exp(-(dist**2) / 100.0)
    dw[dist == 0] = 1
    sw = cc / sizes
    sw[sizes == 1] = 1
    expected = (ce * dw * sw).mean()
    assert abs(ours - expected) < 1e-4


def test_dice_loss_golden():
    probs = RNG.rand(2, 8, 8).astype(np.float32)
    target = (RNG.rand(2, 8, 8) > 0.5).astype(np.float32)
    ours = float(dice_loss(jnp.asarray(probs), jnp.asarray(target)))
    expected = 1 - (2 * (probs * target).sum()) / (probs.sum() + target.sum() + 1e-7)
    assert abs(ours - expected) < 1e-6


def test_multiclass_dice_excludes_background():
    logits = RNG.randn(1, 8, 8, 2).astype(np.float32)
    target = RNG.randint(0, 2, (1, 8, 8))
    full = float(multiclass_dice_loss(jnp.asarray(logits), jnp.asarray(target)))
    nobg = float(multiclass_dice_loss(jnp.asarray(logits), jnp.asarray(target),
                                      excluded_classes=(0,)))
    assert full > nobg  # background channel contributes positive loss


def test_mixed_loss_composition():
    n, h, w = 1, 8, 8
    logits = RNG.randn(n, h, w, 2).astype(np.float32)
    mask = RNG.randint(0, 2, (n, h, w)).astype(np.float32)
    dist = np.zeros((n, h, w), np.float32)
    sizes = np.ones((n, h, w), np.float32)
    target = jnp.asarray(np.stack([mask, dist, sizes], axis=-1))
    logits_j = jnp.asarray(logits)

    # with zero distances and unit sizes all weights are 1 -> weighted CE
    # equals plain CE, so the mixer must equal dice*wd + ce*wc exactly.
    loss_fn = make_loss_fn("weighted", {
        "w0": 50.0, "sigma": 10.0, "imsize": (h, w),
        "dice_weight": 0.25, "bce_weight": 2.0,
    })
    got = float(loss_fn(logits_j, target))
    dice = float(multiclass_dice_loss(logits_j, target[..., 0].astype(jnp.int32),
                                      excluded_classes=(0,)))
    ce = float(multiclass_segmentation_loss(logits_j, target[..., 0].astype(jnp.int32)))
    assert abs(got - (0.25 * dice + 2.0 * ce)) < 1e-5


def test_make_loss_fn_ce():
    logits = jnp.asarray(RNG.randn(1, 4, 4, 2).astype(np.float32))
    target = jnp.asarray(RNG.randint(0, 2, (1, 4, 4, 1)).astype(np.float32))
    loss = make_loss_fn("ce", {})(logits, target)
    assert np.isfinite(float(loss))
