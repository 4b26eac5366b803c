"""Native C++ histogram GBM (cpp/gbm.cpp) — the lgb.train replacement for
the second-level scoring model (reference src/steps/sklearn/models.py:69-99).

Covers: regression quality, LightGBM training semantics (leaf-wise num_leaves
cap, min_data_in_leaf, explicit-valid early stopping, predict at
best_iteration, shrinkage), serialization round-trip, and the scoring
adapter's engine selection."""

import numpy as np
import pickle
import pytest

from mapping_tpu.utils import native_gbm
from mapping_tpu.utils.native_gbm import NativeGBMRegressor

pytestmark = pytest.mark.skipif(not native_gbm.available(),
                                reason="C++ toolchain unavailable")


def _data(n=2000, d=8, seed=0, noise=0.05):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, d)
    y = (2.0 * X[:, 0] + np.sin(6 * X[:, 1]) + X[:, 2] * X[:, 3]
         + noise * rng.randn(n))
    k = int(0.75 * n)
    return X[:k], y[:k], X[k:], y[k:]


def test_regression_quality():
    Xt, yt, Xv, yv = _data()
    m = NativeGBMRegressor(learning_rate=0.1, num_leaves=31, min_data=20,
                           number_boosting_rounds=500,
                           early_stopping_rounds=20).fit(Xt, yt, Xv, yv)
    mse = float(np.mean((m.predict(Xv) - yv) ** 2))
    assert mse < 0.05 * float(np.var(yv))  # r^2 > 0.95


def test_boost_from_average_and_no_split():
    # min_data > n forbids any split: every tree is a stump-less root and
    # the prediction is exactly mean(y) (LightGBM boost_from_average)
    Xt, yt, _, _ = _data(n=200)
    m = NativeGBMRegressor(min_data=10 ** 6,
                           number_boosting_rounds=5).fit(Xt, yt)
    np.testing.assert_allclose(m.predict(Xt), yt.mean(), rtol=0, atol=1e-12)


def test_early_stopping_and_best_iteration():
    Xt, yt, Xv, yv = _data()
    # adversarial valid target: nothing generalizes, stop after patience
    bad = NativeGBMRegressor(learning_rate=0.3, num_leaves=31, min_data=5,
                             number_boosting_rounds=300,
                             early_stopping_rounds=8).fit(Xt, yt, Xv, -yv)
    assert bad.n_trees_ < 300
    assert bad.best_iteration_ <= bad.n_trees_
    good = NativeGBMRegressor(learning_rate=0.3, num_leaves=31, min_data=5,
                              number_boosting_rounds=300,
                              early_stopping_rounds=8).fit(Xt, yt, Xv, yv)
    assert good.best_iteration_ > bad.best_iteration_
    # predict defaults to best_iteration: never worse than the full model
    mse_best = float(np.mean((good.predict(Xv) - yv) ** 2))
    mse_all = float(np.mean(
        (good.predict(Xv, num_iteration=good.n_trees_) - yv) ** 2))
    assert mse_best <= mse_all + 1e-12


def test_num_leaves_one_split_is_single_threshold():
    # num_leaves=2 -> one split per tree; a single tree must be a step
    # function of one feature
    rng = np.random.RandomState(3)
    X = rng.rand(500, 3)
    y = (X[:, 1] > 0.5).astype(np.float64)
    m = NativeGBMRegressor(learning_rate=1.0, num_leaves=2, min_data=10,
                           number_boosting_rounds=1).fit(X, y)
    pred = m.predict(X)
    assert len(np.unique(np.round(pred, 9))) == 2
    # the split must be on the informative feature near 0.5
    lo = pred[X[:, 1] < 0.4]
    hi = pred[X[:, 1] > 0.6]
    assert lo.max() < hi.min()


def test_shrinkage_scales_first_tree():
    Xt, yt, _, _ = _data(n=400)
    m1 = NativeGBMRegressor(learning_rate=0.1, num_leaves=15, min_data=10,
                            number_boosting_rounds=1).fit(Xt, yt)
    m2 = NativeGBMRegressor(learning_rate=0.2, num_leaves=15, min_data=10,
                            number_boosting_rounds=1).fit(Xt, yt)
    d1 = m1.predict(Xt) - yt.mean()
    d2 = m2.predict(Xt) - yt.mean()
    np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-9, atol=1e-12)


def test_pickle_round_trip_exact():
    Xt, yt, Xv, yv = _data(n=600)
    m = NativeGBMRegressor(learning_rate=0.1, num_leaves=31, min_data=10,
                           number_boosting_rounds=50).fit(Xt, yt, Xv, yv)
    m2 = pickle.loads(pickle.dumps(m))
    np.testing.assert_array_equal(m.predict(Xv), m2.predict(Xv))
    assert m2.best_iteration_ == m.best_iteration_


def test_matches_sklearn_family_quality():
    from sklearn.ensemble import HistGradientBoostingRegressor

    Xt, yt, Xv, yv = _data()
    ours = NativeGBMRegressor(learning_rate=0.1, num_leaves=31, min_data=20,
                              number_boosting_rounds=200,
                              early_stopping_rounds=20).fit(Xt, yt, Xv, yv)
    sk = HistGradientBoostingRegressor(
        learning_rate=0.1, max_leaf_nodes=31, min_samples_leaf=20,
        max_iter=200, early_stopping=False).fit(Xt, yt)
    mse_ours = float(np.mean((ours.predict(Xv) - yv) ** 2))
    mse_sk = float(np.mean((sk.predict(Xv) - yv) ** 2))
    assert mse_ours < 1.5 * mse_sk  # same model family, same ballpark


def test_scoring_adapter_uses_native_engine():
    from mapping_tpu.scoring import ScoringGBM

    rng = np.random.RandomState(0)
    X = rng.rand(300, 10)
    y = X[:, 0] + 0.1 * rng.randn(300)
    m = ScoringGBM(model_params={"learning_rate": 0.1, "num_leaves": 15,
                                 "min_data": 5},
                   training_params={"number_boosting_rounds": 50,
                                    "early_stopping_rounds": 5})
    m._fit_estimator(X[:200], y[:200], X[200:], y[200:])
    assert isinstance(m.estimator, NativeGBMRegressor)
    assert m.best_iteration_ >= 1


def test_generic_transformer_consumes_valid_split():
    from mapping_tpu.sklearn_models import GBMRegressor

    rng = np.random.RandomState(1)
    X = rng.rand(300, 6)
    y = X[:, 0] * 2 + 0.05 * rng.randn(300)
    t = GBMRegressor(model_params={"learning_rate": 0.3, "num_leaves": 15,
                                   "min_data": 5},
                     training_params={"number_boosting_rounds": 200,
                                      "early_stopping_rounds": 5})
    # adversarial valid: must stop early
    t.fit(X[:200], y[:200], X_valid=X[200:], y_valid=-y[200:])
    assert t.estimator.n_trees_ < 200
    out = t.transform(X[200:])
    assert out["prediction"].shape == (100,)
