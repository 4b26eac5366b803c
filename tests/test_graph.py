"""DAG engine tests: lazy pull, adapters/reducers, trainable persistence,
output caching, rebinding, introspection (reference semantics,
src/steps/base.py)."""

import numpy as np
import pandas as pd
import pytest

from mapping_tpu.graph import (BaseTransformer, Dummy, Step, XYSplit,
                               average_inputs, make_apply_transformer,
                               make_apply_transformer_stream, squeeze_inputs)


class AddOne(BaseTransformer):
    def transform(self, x, **_):
        return {"x": [v + 1 for v in x]}


class CountingFit(BaseTransformer):
    fits = 0

    def __init__(self):
        self.offset = None

    def fit(self, x, **_):
        CountingFit.fits += 1
        self.offset = 10
        return self

    def transform(self, x, **_):
        return {"x": [v + self.offset for v in x]}

    def save(self, filepath):
        import joblib

        joblib.dump(self.offset, filepath)

    def load(self, filepath):
        import joblib

        self.offset = joblib.load(filepath)
        return self


def test_lazy_pull_and_adapter(tmp_path):
    cache = str(tmp_path)
    a = Step("a", AddOne(), cache, input_data=["input"])
    b = Step("b", AddOne(), cache, input_steps=[a])
    out = b.fit_transform({"input": {"x": [1, 2, 3]}})
    assert out["x"] == [3, 4, 5]


def test_trainable_cache_roundtrip(tmp_path):
    cache = str(tmp_path)
    CountingFit.fits = 0
    s = Step("t", CountingFit(), cache, input_data=["input"],
             is_trainable=True)
    out1 = s.fit_transform({"input": {"x": [1]}})
    assert out1["x"] == [11] and CountingFit.fits == 1
    # second fit_transform loads from disk, no refit
    s2 = Step("t", CountingFit(), cache, input_data=["input"],
              is_trainable=True)
    out2 = s2.fit_transform({"input": {"x": [2]}})
    assert out2["x"] == [12] and CountingFit.fits == 1
    # transform-only path requires the cache
    s3 = Step("t2", CountingFit(), cache, input_data=["input"],
              is_trainable=True)
    with pytest.raises(RuntimeError):
        s3.transform({"input": {"x": [1]}})


def test_force_fitting(tmp_path):
    cache = str(tmp_path)
    CountingFit.fits = 0
    s = Step("t", CountingFit(), cache, input_data=["input"],
             is_trainable=True, force_fitting=True)
    s.fit_transform({"input": {"x": [1]}})
    s._output_cache = None
    s.fit_transform({"input": {"x": [1]}})
    assert CountingFit.fits == 2


def test_adapter_reducers(tmp_path):
    cache = str(tmp_path)
    a = Step("a", AddOne(), cache, input_data=["input"])
    b = Step("b", AddOne(), cache, input_data=["input"])
    avg = Step(
        "avg", Dummy(), cache, input_steps=[a, b],
        adapter={"y_pred": ([("a", "x"), ("b", "x")], average_inputs)})
    out = avg.fit_transform({"input": {"x": np.array([1.0, 3.0])}})
    np.testing.assert_allclose(out["y_pred"], [2.0, 4.0])


def test_output_cache_and_rebind(tmp_path):
    cache = str(tmp_path)
    a = Step("a", AddOne(), cache, input_data=["input"], cache_output=True)
    b = Step("b", AddOne(), cache, input_steps=[a])
    out = b.fit_transform({"input": {"x": [0]}})
    assert out["x"] == [2]
    # rebind: swap the transformer on a named step (reference
    # src/pipelines.py:49-51), clear caches, re-run
    class TimesTen(BaseTransformer):
        def transform(self, x, **_):
            return {"x": [v * 10 for v in x]}

    b.get_step("a").transformer = TimesTen()
    b.clean_cache()
    out = b.fit_transform({"input": {"x": [3]}})
    assert out["x"] == [31]


def test_graph_introspection(tmp_path):
    cache = str(tmp_path)
    a = Step("a", AddOne(), cache, input_data=["input"])
    b = Step("b", AddOne(), cache, input_steps=[a])
    nodes, edges = b.graph_info()
    assert set(nodes) == {"a", "b"}
    assert ("a", "b") in edges and ("data:input", "a") in edges
    dot = b.to_dot()
    assert '"a" -> "b"' in dot


def test_xy_split():
    meta = pd.DataFrame({"img": ["a.jpg", "b.jpg"], "mask": ["a.png", "b.png"]})
    split = XYSplit(["img"], ["mask"])
    out = split.transform(meta, train_mode=True)
    assert list(out["X"]) == ["a.jpg", "b.jpg"]
    assert list(out["y"]) == ["a.png", "b.png"]
    out = split.transform(meta[["img"]], train_mode=True)
    assert out["y"] is None


def test_apply_transformers():
    t = make_apply_transformer(lambda a, b: a + b, output_name="s",
                               apply_on=["xs", "ys"])
    out = t.transform(xs=[1, 2], ys=[10, 20])
    assert out["s"] == [11, 22]
    with pytest.raises(ValueError):
        t.transform(xs=[1], ys=[1, 2])
    ts = make_apply_transformer_stream(lambda a: a * 2, output_name="s",
                                       apply_on=["xs"])
    gen = ts.transform(xs=iter([1, 2, 3]))["s"]
    assert list(gen) == [2, 4, 6]


def test_misc_utils():
    import pandas as pd

    from mapping_tpu.utils.misc import (Averager, denormalize_img,
                                        generate_data_frame_chunks, softmax)

    p = softmax(np.array([[1.0, 2.0, 3.0]]))
    np.testing.assert_allclose(p.sum(), 1.0)
    img = np.zeros((2, 2, 3))
    out = denormalize_img(img)
    np.testing.assert_allclose(out[0, 0], [0.485, 0.456, 0.406])
    df = pd.DataFrame({"a": range(5)})
    chunks = list(generate_data_frame_chunks(df, 2))
    assert [len(c) for c in chunks] == [2, 2, 1]
    a = Averager()
    a.send(1.0); a.send(3.0)
    assert a.value == 2.0


def test_sklearn_wrappers(tmp_path):
    from sklearn.linear_model import LinearRegression

    from mapping_tpu.sklearn_models import GBMRegressor, SklearnRegressor

    X = np.arange(40, dtype=float).reshape(-1, 1)
    y = 3 * X[:, 0] + 1
    reg = SklearnRegressor(LinearRegression())
    reg.fit(X, y)
    pred = reg.transform(X)["prediction"]
    np.testing.assert_allclose(pred, y, atol=1e-6)
    path = str(tmp_path / "reg.joblib")
    reg.save(path)
    reg2 = SklearnRegressor().load(path)
    np.testing.assert_allclose(reg2.transform(X)["prediction"], y, atol=1e-6)

    X2 = np.linspace(0, 40, 400).reshape(-1, 1)
    y2 = 3 * X2[:, 0] + 1
    gbm = GBMRegressor(model_params={"learning_rate": 0.3},
                       training_params={"number_boosting_rounds": 100})
    gbm.fit(X2, y2)
    pred = gbm.transform(X2)["prediction"]
    assert np.abs(pred - y2).mean() < 2.0
