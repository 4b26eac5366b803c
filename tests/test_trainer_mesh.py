"""UNetTrainer with an explicit 8-device mesh: fit + predict shard over the
'data' axis and match the single-device run."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from mapping_tpu.parallel import make_mesh
from mapping_tpu.train.trainer import UNetTrainer


def _make_trainer(mesh):
    # f32 compute: bf16 reduction-order differences between the sharded and
    # single-device runs would otherwise dominate the comparison
    return UNetTrainer(
        model_params={"encoder": "from_scratch", "n_filters": 4,
                      "repeat_blocks": 2, "dtype": jnp.float32},
        optimizer_params={"lr": 1e-2},
        loss_params={"imsize": (32, 32)},
        training_config={"epochs": 2},
        loss_name="ce",
        input_size=(32, 32),
        mesh=mesh,
    )


def _datagen(n=8):
    rng = np.random.RandomState(0)
    img = rng.rand(n, 32, 32, 3).astype(np.float32)
    mask = (img.mean(-1) > 0.5).astype(np.float32)
    batch = {"image": jnp.asarray(img),
             "target": jnp.asarray(np.stack(
                 [mask, np.zeros_like(mask), np.ones_like(mask)], -1))}

    class Flow:
        def __iter__(self):
            return iter([batch])

        def __len__(self):
            return 1

    return (Flow(), 1)


@pytest.mark.slow
def test_trainer_mesh_matches_single_device():
    assert len(jax.devices()) == 8
    datagen = _datagen()
    t_single = _make_trainer(None).fit(datagen)
    t_mesh = _make_trainer(make_mesh()).fit(datagen)
    # cross-device reduction order (BN stats, grad sums) shifts f32 results
    # by ~1e-5 per step; assert agreement to that scale, not bitwise
    p1 = jax.tree_util.tree_leaves(t_single.state.params)[0]
    p2 = jax.tree_util.tree_leaves(t_mesh.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-4)

    probs_s = np.concatenate([np.asarray(p) for p in
                              t_single.predict_probs_datagen(datagen)])
    probs_m = np.concatenate([np.asarray(p) for p in
                              t_mesh.predict_probs_datagen(datagen)])
    # param noise amplifies through softmax; require agreement of the
    # decisions, not the logit tails
    np.testing.assert_allclose(probs_s, probs_m, atol=2e-2)
    agree = (probs_s.argmax(-1) == probs_m.argmax(-1)).mean()
    assert agree > 0.995, f"class decisions diverged: {agree}"
