"""BN folding parity: the fold_bn=True model with folded params must
reproduce the standard inference forward (VERDICT r1 item 2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapping_tpu.models.fold_bn import (can_fold, fold_batch_stats,
                                        folded_inference_model)
from mapping_tpu.models.unet_resnet import UNetResNet


def _randomized_variables(model, rng, x):
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # randomize BN running stats so mean/var/eps handling is exercised
    def rand_stats(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rand_stats(v)
            else:
                if k == "mean":
                    out[k] = jnp.asarray(rng.randn(*v.shape).astype(np.float32))
                elif k == "var":
                    out[k] = jnp.asarray(
                        rng.rand(*v.shape).astype(np.float32) + 0.1)
                else:
                    out[k] = v
        return out

    return {"params": variables["params"],
            "batch_stats": rand_stats(variables["batch_stats"])}


@pytest.mark.parametrize("depth", [34, 101])
def test_folded_forward_matches_f32(depth):
    model = UNetResNet(encoder_depth=depth, num_classes=2, num_filters=4,
                       dtype=jnp.float32)
    assert can_fold(model)
    rng = np.random.RandomState(depth)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = _randomized_variables(model, rng, x)

    ref = model.apply(variables, x, train=False)

    fm, fp = folded_inference_model(model, variables["params"],
                                    variables["batch_stats"])
    got = fm.apply({"params": fp}, x, train=False)
    # folding reorders the scale multiply around the conv; f32 rounding
    # accumulates with depth (randomized var in [0.1, 1.1] is adversarial)
    tol = dict(rtol=1e-4, atol=1e-4) if depth == 34 else dict(rtol=5e-3,
                                                              atol=5e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)


def test_folded_param_tree_has_no_bn():
    model = UNetResNet(encoder_depth=34, num_classes=2, num_filters=4,
                       dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    folded = fold_batch_stats(variables["params"], variables["batch_stats"])

    def walk(tree, path=""):
        for k, v in tree.items():
            assert not k.startswith("bn"), f"unfolded BN at {path}/{k}"
            assert k != "downsample_bn", f"unfolded BN at {path}/{k}"
            if isinstance(v, dict) and "kernel" not in v:
                walk(v, path + "/" + k)

    walk(folded)
    # the folded tree inits the fold_bn=True model exactly
    fm = model.clone(fold_bn=True)
    expect = fm.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, expect["params"])
    got_shapes = jax.tree_util.tree_map(jnp.shape, folded)
    assert ref_shapes == got_shapes


def test_trainer_predict_uses_folding():
    from mapping_tpu.train.trainer import UNetTrainer

    trainer = UNetTrainer(
        model_params={"encoder": "ResNet34", "num_filters": 4,
                      "dtype": "float32"},
        optimizer_params={"lr": 1e-3},
        loss_params={},
        training_config={"epochs": 1},
        input_size=(64, 64),
    )
    trainer._ensure_state()
    predict = trainer.predict_probs_fn()
    assert trainer._fold_params is not None  # folding engaged
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    probs_folded = np.asarray(predict(x))
    probs_std = np.asarray(trainer._predict_step(trainer.state, x))
    np.testing.assert_allclose(probs_folded, probs_std, rtol=1e-4, atol=1e-4)
