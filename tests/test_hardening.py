"""Regression tests for the round-4 robustness pass: hostile/degenerate
inputs at the native-code and config boundaries must fail loudly (Python
exceptions) or fall back cleanly — never segfault, never read out of
bounds, never feed the model silently-wrong pixels."""

import ctypes
import struct

import numpy as np
import pytest

from mapping_tpu.config import load_params
from mapping_tpu.utils import native, native_decode, native_gbm
from mapping_tpu.utils.native_gbm import NativeGBMRegressor


# ---------------------------------------------------------------- GBM ----

gbm_only = pytest.mark.skipif(not native_gbm.available(),
                              reason="C++ toolchain unavailable")


@gbm_only
def test_gbm_nan_features_train_and_predict():
    # NaN violates strict weak ordering (std::sort UB) if it reaches the
    # bin-boundary sort; the scoring table carries NaN for no-GT rows
    # (scoring.py), so the binner must drop NaN before sorting and route
    # NaN to bin 0 at lookup
    rng = np.random.RandomState(0)
    X = rng.rand(800, 4)
    X[::7, 2] = np.nan
    y = 2.0 * X[:, 0] + 0.05 * rng.randn(800)
    m = NativeGBMRegressor(learning_rate=0.1, num_leaves=15, min_data=10,
                           number_boosting_rounds=40).fit(X, y)
    pred = m.predict(X)
    assert np.all(np.isfinite(pred))
    # all-NaN feature: zero sortable values, still must not crash
    X2 = X.copy()
    X2[:, 3] = np.nan
    m2 = NativeGBMRegressor(learning_rate=0.1, num_leaves=15, min_data=10,
                            number_boosting_rounds=10).fit(X2, y)
    assert np.all(np.isfinite(m2.predict(X2)))


@gbm_only
def test_gbm_predict_feature_count_mismatch_raises():
    rng = np.random.RandomState(1)
    X = rng.rand(300, 5)
    y = X[:, 0]
    m = NativeGBMRegressor(number_boosting_rounds=5, min_data=10).fit(X, y)
    with pytest.raises(ValueError, match="feature"):
        m.predict(rng.rand(10, 4))
    with pytest.raises(ValueError, match="feature"):
        m.predict(rng.rand(10, 6))


@gbm_only
def test_gbm_unfitted_guards():
    m = NativeGBMRegressor()
    with pytest.raises(RuntimeError, match="not fitted"):
        m.predict(np.zeros((1, 3)))
    with pytest.raises(RuntimeError, match="not fitted"):
        m.to_bytes()


@gbm_only
def test_gbm_corrupt_blob_content_rejected():
    # craft blobs that pass the SIZE checks but carry garbage node content:
    # header = init_score(8) + num_features(4) + best_iter(4) + n_trees(4);
    # per tree: node_count(4) then 28-byte nodes (feat, left, right i32;
    # threshold, value f64). grow_tree appends children after parents, so
    # left/right <= own index or >= node count means a malformed walk.
    rng = np.random.RandomState(2)
    X = rng.rand(400, 3)
    y = X[:, 0] + 0.01 * rng.randn(400)
    m = NativeGBMRegressor(learning_rate=0.1, num_leaves=7, min_data=20,
                           number_boosting_rounds=3).fit(X, y)
    blob = bytearray(m.to_bytes())
    node0 = 20 + 4  # first tree's first node
    feat0 = struct.unpack_from("<i", blob, node0)[0]
    assert feat0 >= 0  # a real split node, else the test fixture is wrong

    bad_left = bytearray(blob)
    struct.pack_into("<i", bad_left, node0 + 4, 0)  # left <= own index
    with pytest.raises(ValueError, match="corrupt"):
        NativeGBMRegressor.from_bytes(bytes(bad_left))

    bad_feat = bytearray(blob)
    struct.pack_into("<i", bad_feat, node0, 99)  # feature >= num_features
    with pytest.raises(ValueError, match="corrupt"):
        NativeGBMRegressor.from_bytes(bytes(bad_feat))

    with pytest.raises(ValueError, match="corrupt"):
        NativeGBMRegressor.from_bytes(bytes(blob[:15]))  # truncated header
    # negative tree count packed into a size-valid header
    bad_nt = bytearray(blob)
    struct.pack_into("<i", bad_nt, 16, -5)
    with pytest.raises(ValueError, match="corrupt"):
        NativeGBMRegressor.from_bytes(bytes(bad_nt))

    # the untouched blob still round-trips
    m2 = NativeGBMRegressor.from_bytes(bytes(blob))
    np.testing.assert_array_equal(m.predict(X), m2.predict(X))


# ------------------------------------------------------------- config ----

def test_load_params_rejects_non_mapping_yaml(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("- a\n- b\n")
    with pytest.raises(ValueError, match="expected a yaml mapping"):
        load_params(str(p))


def test_load_params_rejects_scalar_parameters(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("parameters: 42\n")
    with pytest.raises(ValueError, match="must be a mapping"):
        load_params(str(p))


def test_load_params_bare_parameters_key_is_defaults(tmp_path):
    p = tmp_path / "empty.yaml"
    p.write_text("parameters:\n")
    params = load_params(str(p))
    assert params["image_h"] == load_params()["image_h"]


# ---------------------------------------------------------------- RLE ----

@pytest.mark.skipif(not native.available(),
                    reason="C++ toolchain unavailable")
def test_rle_instances_fragmented_map_grows_buffer():
    # checkerboard: ~H*W runs of length 1 — the conservative 13-bytes/count
    # pre-check rejects the initial cap even though the delta-coded output
    # (1-2 bytes/count) fits; the binding must grow and retry, not raise
    h = w = 128
    yy, xx = np.mgrid[:h, :w]
    labels = ((yy + xx) % 2).astype(np.int32)  # instance 1 on odd parity
    out = native.rle_instances(labels, 1)
    assert len(out) == 1
    counts_bytes, bbox = out[0]
    # decode and check total pixel count matches the instance area
    counts = native.string_to_counts(counts_bytes)
    area = sum(counts[1::2])
    assert area == int((labels == 1).sum())
    assert bbox == [0.0, 0.0, float(w), float(h)]


# ------------------------------------------------------------- decode ----

def test_decode_declines_geometry_drift(tmp_path, monkeypatch):
    """A file replaced between probe and decode fills a buffer sized for the
    OLD geometry; _decode must notice the decoded dims differ and decline
    (PIL re-reads coherently). Simulated with a probe that lies."""
    from imageio import imwrite

    if not native_decode.build():
        pytest.skip("native decode toolchain unavailable")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (40, 50, 3)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    imwrite(p, img)

    real = native_decode._load()

    class LyingLib:
        def __getattr__(self, name):
            return getattr(real, name)

        @staticmethod
        def decode_probe(path, h, w):
            rc = real.decode_probe(path, h, w)
            # same byte count, transposed geometry: the stale-buffer case
            # a size check alone cannot catch
            hv, wv = h._obj.value, w._obj.value
            h._obj.value, w._obj.value = wv, hv
            return rc

    monkeypatch.setattr(native_decode, "_load", lambda: LyingLib())
    assert native_decode.decode_rgb(p) is None
    monkeypatch.undo()
    np.testing.assert_array_equal(native_decode.decode_rgb(p), img)
