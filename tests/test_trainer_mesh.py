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


@pytest.mark.slow
def test_trainer_mesh_multi_step_dispatch():
    """steps_per_call > 1 on a mesh: stacked (K, B, ...) batches shard axis 1
    over 'data' and the trajectory matches the per-step mesh run."""
    assert len(jax.devices()) == 8

    def datagen_multi(n_batches=4):
        rng = np.random.RandomState(1)
        batches = []
        for _ in range(n_batches):
            img = rng.rand(8, 32, 32, 3).astype(np.float32)
            mask = (img.mean(-1) > 0.5).astype(np.float32)
            batches.append({"image": jnp.asarray(img),
                            "target": jnp.asarray(np.stack(
                                [mask, np.zeros_like(mask),
                                 np.ones_like(mask)], -1))})

        class Flow:
            def __iter__(self):
                return iter(batches)

            def __len__(self):
                return len(batches)

        return (Flow(), n_batches)

    def trainer(spc, epochs=2):
        return UNetTrainer(
            model_params={"encoder": "from_scratch", "n_filters": 4,
                          "repeat_blocks": 2, "dtype": jnp.float32},
            optimizer_params={"lr": 1e-2},
            loss_params={"imsize": (32, 32)},
            training_config={"epochs": epochs, "steps_per_call": spc},
            loss_name="ce",
            input_size=(32, 32),
            mesh=make_mesh(),
        )

    # The meaningful cross-program equivalence is the per-step LOSS sequence:
    # the scanned and per-step programs compile to different GSPMD reduction
    # schedules, whose ~1e-9 gradient reassociation noise Adam amplifies to
    # full +-lr param flips wherever a gradient element is near zero (the
    # first Adam update is lr*sign(g) elementwise), so tight param-space
    # comparison across programs is meaningless by construction. A wiring bug
    # (wrong batch slice / sharding) shifts the losses at O(1e-2).
    losses = {1: [], 2: []}
    from mapping_tpu.train.callbacks import CallbackList
    orig = CallbackList.on_batch_end
    trainers = {}
    try:
        for spc in (1, 2):
            def patched(self, metrics=None, _spc=spc, **kw):
                losses[_spc].append(metrics["loss"])
                return orig(self, metrics=metrics, **kw)
            CallbackList.on_batch_end = patched
            trainers[spc] = trainer(spc, epochs=2).fit(datagen_multi(4))
    finally:
        CallbackList.on_batch_end = orig
    assert trainers[2]._steps_per_call == 2
    assert int(trainers[2].state.step) == int(trainers[1].state.step) == 8
    assert len(losses[1]) == len(losses[2]) == 8
    # first group starts from identical state: exact to reassociation noise
    np.testing.assert_allclose(losses[2][:2], losses[1][:2], atol=1e-5)
    # later groups: noise amplified through the trajectory, still tracking
    np.testing.assert_allclose(losses[2], losses[1], atol=5e-3)
    # params stay finite and in the same neighborhood (each element can
    # legitimately differ by ~2*lr per sign-flipped near-zero gradient)
    for p1, p2 in zip(jax.tree_util.tree_leaves(trainers[1].state.params),
                      jax.tree_util.tree_leaves(trainers[2].state.params)):
        assert np.isfinite(np.asarray(p2)).all()
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=0.2)


def test_warm_start_on_mesh_matches_single_device():
    """warm_start under a mesh: the loaded stage weights re-shard
    replicated and the warm-started mesh fit matches the warm-started
    single-device fit (f32, loss-sequence comparison is overkill for one
    step; params agree to reduction-order noise)."""
    import os
    import tempfile

    datagen = _datagen()
    t0 = _make_trainer(None).fit(datagen)
    with tempfile.TemporaryDirectory() as d:
        cache = os.path.join(d, "unet.msgpack")
        t0.save(cache)

        t_single = _make_trainer(None)
        t_single.warm_start(cache)
        t_single.fit(datagen)

        t_mesh = _make_trainer(make_mesh())
        t_mesh.warm_start(cache)
        t_mesh.fit(datagen)

    assert t_mesh.warm_started_from == cache
    # same tolerance discipline as test_trainer_mesh_matches_single_device:
    # cross-device reduction order shifts f32 Adam updates by ~1e-4; compare
    # to that scale and require matching class decisions
    p1 = jax.tree_util.tree_leaves(t_single.state.params)[0]
    p2 = jax.tree_util.tree_leaves(t_mesh.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-4)
    probs_s = np.concatenate([np.asarray(p) for p in
                              t_single.predict_probs_datagen(datagen)])
    probs_m = np.concatenate([np.asarray(p) for p in
                              t_mesh.predict_probs_datagen(datagen)])
    agree = (probs_s.argmax(-1) == probs_m.argmax(-1)).mean()
    assert agree > 0.995, f"class decisions diverged: {agree}"
