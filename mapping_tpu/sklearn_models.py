"""Generic sklearn-family transformer wrappers (L0 live-path parity).

Parity targets: the reference's generic `LightGBM` and `SklearnRegressor`
step transformers (src/steps/sklearn/models.py:30-99) — thin
fit/transform/save/load wrappers usable as `graph.Step` transformers. The
specialized per-instance scoring models live in mapping_tpu/scoring.py;
these are the generic building blocks (lightgbm itself is not in this image,
so the GBM slot is sklearn's histogram gradient boosting).
"""

from typing import Any, Dict, Optional

import numpy as np

from mapping_tpu.graph import BaseTransformer


class SklearnRegressor(BaseTransformer):
    """Wrap any sklearn regressor estimator (reference :30-40)."""

    def __init__(self, estimator=None):
        self.estimator = estimator

    def fit(self, X, y, **kwargs):
        self.estimator.fit(np.asarray(X), np.asarray(y).ravel())
        return self

    def transform(self, X, **kwargs):
        return {"prediction": self.estimator.predict(np.asarray(X))}

    def save(self, filepath):
        import joblib

        joblib.dump(self.estimator, filepath)

    def load(self, filepath):
        import joblib

        self.estimator = joblib.load(filepath)
        return self


class SklearnClassifier(BaseTransformer):
    """Wrap any sklearn classifier; returns class probabilities
    (reference src/steps/sklearn/models.py:13-27)."""

    def __init__(self, estimator=None):
        self.estimator = estimator

    def fit(self, X, y, **kwargs):
        self.estimator.fit(np.asarray(X), np.asarray(y).ravel())
        return self

    def transform(self, X, **kwargs):
        return {"prediction_probability":
                self.estimator.predict_proba(np.asarray(X))}

    def save(self, filepath):
        import joblib

        joblib.dump(self.estimator, filepath)

    def load(self, filepath):
        import joblib

        self.estimator = joblib.load(filepath)
        return self


class GBMRegressor(BaseTransformer):
    """Gradient-boosted-trees regressor with early stopping — the generic
    `LightGBM` transformer slot (reference src/steps/sklearn/models.py:69-99).
    lightgbm is unavailable in this image; the primary engine is the native
    C++ histogram GBM (cpp/gbm.cpp) with lgb.train's semantics (leaf-wise
    growth, min_data, explicit-valid early stopping, best_iteration predict);
    sklearn HistGradientBoostingRegressor is the no-toolchain fallback."""

    def __init__(self, model_params: Optional[Dict[str, Any]] = None,
                 training_params: Optional[Dict[str, Any]] = None):
        self.model_params = dict(model_params or {})
        self.training_params = dict(training_params or {})
        self.estimator = None

    def fit(self, X, y, X_valid=None, y_valid=None, **kwargs):
        from mapping_tpu.utils import native_gbm

        X = np.asarray(X)
        y = np.asarray(y).ravel()
        if y_valid is None:
            X_valid = None  # a features-only valid set can't drive early stop
        if native_gbm.available():
            self.estimator = native_gbm.NativeGBMRegressor(
                learning_rate=self.model_params.get("learning_rate", 0.01),
                num_leaves=int(self.model_params.get("num_leaves", 255)),
                min_data=int(self.model_params.get("min_data", 20)),
                max_depth=int(self.model_params.get("max_depth", 0) or 0),
                sub_feature=float(self.model_params.get("sub_feature", 1.0)),
                number_boosting_rounds=int(self.training_params.get(
                    "number_boosting_rounds", 500)),
                early_stopping_rounds=int(self.training_params.get(
                    "early_stopping_rounds", 10)))
            yv = np.asarray(y_valid).ravel() if y_valid is not None else None
            self.estimator.fit(X, y, X_valid, yv)
            return self
        from sklearn.ensemble import HistGradientBoostingRegressor

        self.estimator = HistGradientBoostingRegressor(
            learning_rate=self.model_params.get("learning_rate", 0.01),
            max_leaf_nodes=min(int(self.model_params.get("num_leaves", 255)),
                               255),
            max_depth=self.model_params.get("max_depth", None),
            max_iter=min(int(self.training_params.get(
                "number_boosting_rounds", 500)), 5000),
            early_stopping="auto",  # holds out validation only on big data
            n_iter_no_change=int(self.training_params.get(
                "early_stopping_rounds", 10)),
            random_state=1234,
        )
        self.estimator.fit(X, y)
        return self

    def transform(self, X, **kwargs):
        return {"prediction": self.estimator.predict(np.asarray(X))}

    def save(self, filepath):
        import joblib

        joblib.dump(self.estimator, filepath)

    def load(self, filepath):
        import joblib

        self.estimator = joblib.load(filepath)
        return self


LightGBM = GBMRegressor  # reference-name alias
