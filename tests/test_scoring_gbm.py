"""The GBM scoring adapter must consume the explicit train/valid split for
early stopping (reference lgb.train valid_sets semantics,
src/steps/sklearn/models.py:75-95) — VERDICT r1 weak #4."""

import numpy as np

from mapping_tpu.scoring import ScoringGBM


def _make_model(rounds=300, patience=10):
    return ScoringGBM(
        model_params={"learning_rate": 0.3, "num_leaves": 31,
                      "max_depth": 6, "min_data": 5},
        training_params={"number_boosting_rounds": rounds,
                         "early_stopping_rounds": patience},
    )


def test_valid_split_drives_early_stopping():
    rng = np.random.RandomState(0)
    X = rng.rand(400, 10)
    y = X[:, 0] * 2 + X[:, 1] - X[:, 2] + 0.05 * rng.randn(400)

    # adversarial validation targets: more boosting on train only hurts
    # valid loss, so an adapter that honors the split stops almost at once
    m_bad = _make_model()
    m_bad._fit_estimator(X[:300], y[:300], X[300:], -y[300:])
    # consistent validation: training runs much longer
    m_good = _make_model()
    m_good._fit_estimator(X[:300], y[:300], X[300:], y[300:])

    assert m_bad.best_iteration_ < m_good.best_iteration_
    assert m_bad.best_iteration_ <= 25  # stopped by the bogus valid signal


def test_min_data_maps_to_min_samples_leaf():
    m = _make_model(rounds=20)
    X = np.random.RandomState(1).rand(100, 4)
    y = X[:, 0]
    m._fit_estimator(X[:80], y[:80], X[80:], y[80:])
    assert m.estimator.min_samples_leaf == 5
