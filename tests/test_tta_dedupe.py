"""TTA variant dedupe: the `ud elif lr` chain (reference
src/loaders.py:477-496) makes (ud=True, lr=True, rot) transform-identical to
(ud=True, lr=False, rot); the deduped 12-variant weighted aggregation must
reproduce the 16-variant result for every aggregation method."""

import jax
import jax.numpy as jnp
import numpy as np

from mapping_tpu.data.tta import (aggregate, dedupe_specs, expand_batch,
                                  inverse_batch, tta_specs, tta_wrap_predict)


def test_dedupe_counts():
    specs = tta_specs(flip_ud=True, flip_lr=True, rotation=True)
    assert len(specs) == 16
    uniq, weights = dedupe_specs(specs)
    assert len(uniq) == 12
    assert sum(weights) == 16
    # the four doubled variants are the ud=True rotations
    assert sorted(w for w in weights if w > 1) == [2, 2, 2, 2]
    for spec, w in zip(uniq, weights):
        if w == 2:
            assert spec.ud_flip


def test_dedupe_identity_when_no_duplicates():
    specs = tta_specs(flip_ud=True, flip_lr=False, rotation=True)
    uniq, weights = dedupe_specs(specs)
    assert uniq == specs
    assert all(w == 1 for w in weights)


def _fake_predict(flat):
    # deterministic nonlinear function of the input so every variant differs
    x = jnp.stack([flat.mean(-1), flat[..., 0] * 0.5 + 0.1], axis=-1)
    return jax.nn.softmax(x, axis=-1)


def test_wrap_predict_dedupe_matches_full():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    specs = tta_specs(flip_ud=True, flip_lr=True, rotation=True)
    for method in ("mean", "max", "min", "gmean"):
        full = tta_wrap_predict(_fake_predict, specs, method,
                                dedupe=False)(images)
        deduped = tta_wrap_predict(_fake_predict, specs, method,
                                   dedupe=True)(images)
        np.testing.assert_allclose(np.asarray(deduped), np.asarray(full),
                                   rtol=0, atol=1e-6, err_msg=method)


def test_wrap_predict_dedupe_runs_12_forwards():
    specs = tta_specs(flip_ud=True, flip_lr=True, rotation=True)
    seen = []

    def recording_predict(flat):
        seen.append(int(flat.shape[0]))
        return _fake_predict(flat)

    images = jnp.zeros((3, 8, 8, 3), jnp.float32)
    tta_wrap_predict(recording_predict, specs, "mean", dedupe=True)(images)
    assert seen == [3 * 12]
    seen.clear()
    tta_wrap_predict(recording_predict, specs, "mean", dedupe=False)(images)
    assert seen == [3 * 16]


def test_weighted_aggregate_equals_duplicated_stack():
    rng = np.random.RandomState(1)
    uniq = jnp.asarray(rng.rand(2, 3, 4, 4, 2).astype(np.float32))
    # duplicate variant 1 twice and variant 2 three times
    dup = jnp.concatenate([uniq[:, :1], uniq[:, 1:2], uniq[:, 1:2],
                           uniq[:, 2:3], uniq[:, 2:3], uniq[:, 2:3]], axis=1)
    weights = [1, 2, 3]
    for method in ("mean", "gmean", "max", "min"):
        got = aggregate(uniq, method, weights=weights)
        want = aggregate(dup, method)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, err_msg=method)


def test_expand_inverse_roundtrip_for_duplicate_specs():
    """Sanity: the duplicate specs really perform identical transforms."""
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    specs = tta_specs(flip_ud=True, flip_lr=True, rotation=True)
    expanded = np.asarray(expand_batch(images, specs))
    uniq, weights = dedupe_specs(specs)
    by_key = {}
    for i, spec in enumerate(specs):
        key = ("ud" if spec.ud_flip else "lr" if spec.lr_flip else "id",
               spec.rotation)
        by_key.setdefault(key, []).append(i)
    for idxs in by_key.values():
        for j in idxs[1:]:
            np.testing.assert_array_equal(expanded[:, idxs[0]],
                                          expanded[:, j])
