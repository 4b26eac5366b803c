"""Train-step tests: loss decreases; SPMD over a virtual 8-device mesh
(SURVEY.md §4: multi-chip tests on CPU via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from mapping_tpu.models import UNet
from mapping_tpu.parallel import make_mesh
from mapping_tpu.train import (
    create_train_state,
    make_eval_step,
    make_loss_fn,
    make_train_step,
)
from mapping_tpu.train.state import make_optimizer
from mapping_tpu.train.step import place_for_mesh


def _toy_batch(n=4, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    image = rng.rand(n, h, w, 3).astype(np.float32)
    # target: bright pixels are class 1 -> learnable from the image
    mask = (image.mean(-1) > 0.5).astype(np.float32)
    dist = np.zeros((n, h, w), np.float32)
    sizes = np.ones((n, h, w), np.float32)
    return {
        "image": jnp.asarray(image),
        "target": jnp.asarray(np.stack([mask, dist, sizes], -1)),
    }


def _make_state(seed=0, h=32, w=32):
    model = UNet(n_filters=4, repeat_blocks=2, dtype=jnp.float32)
    tx = make_optimizer(lr=1e-2, gamma=0.99, weight_decay=1e-4)
    return create_train_state(
        model, jax.random.PRNGKey(seed), (1, h, w, 3), tx)


@pytest.mark.slow
def test_loss_decreases():
    state = _make_state()
    batch = _toy_batch()
    loss_fn = make_loss_fn("weighted", {"imsize": (32, 32)})
    step = make_train_step(loss_fn)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_eval_step_runs():
    state = _make_state()
    batch = _toy_batch()
    loss_fn = make_loss_fn("ce", {})
    val = make_eval_step(loss_fn)(state, batch)
    assert np.isfinite(float(val))


@pytest.mark.slow
def test_train_step_data_parallel_mesh():
    assert len(jax.devices()) == 8, "conftest should fake 8 CPU devices"
    mesh = make_mesh()
    state = _make_state()
    batch = _toy_batch(n=8)
    loss_fn = make_loss_fn("weighted", {"imsize": (32, 32)})
    step = make_train_step(loss_fn)

    # fresh states per run: the train step donates its input state buffers
    state_sharded, batch_sharded = place_for_mesh(state, batch, mesh)
    state1, m1 = step(state_sharded, batch_sharded)
    # single-device run must agree with the sharded run bit-for-bit-ish
    state2, m2 = step(_make_state(), batch)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_lr_schedule_decays():
    tx = make_optimizer(lr=1.0, gamma=0.5, decay_every_steps=1)
    params = {"kernel": jnp.ones((2, 2))}
    opt_state = tx.init(params)
    g = {"kernel": jnp.ones((2, 2))}
    _, opt_state = tx.update(g, opt_state, params)
    u2, _ = tx.update(g, opt_state, params)
    # second step uses lr*gamma; adam normalizes so magnitude ~ lr
    assert np.abs(np.asarray(u2["kernel"])).max() < 1.0


def test_multi_step_matches_sequential():
    """make_train_step_multi (K steps per dispatch via scan) must follow the
    same trajectory as K single-step dispatches (identical up to XLA
    fusion/reassociation noise ~1e-7)."""
    from mapping_tpu.train.step import make_train_step_multi

    loss_fn = make_loss_fn("weighted", {"imsize": (32, 32)})
    state_a = _make_state()
    state_b = _make_state()
    step = make_train_step(loss_fn)
    multi = make_train_step_multi(loss_fn)

    batches = [_toy_batch(seed=s) for s in range(4)]
    losses_seq = []
    for b in batches:
        state_a, metrics = step(state_a, b)
        losses_seq.append(float(metrics["loss"]))

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)
    state_b, metrics = multi(state_b, stacked)
    losses_multi = [float(v) for v in np.asarray(metrics["loss"])]

    np.testing.assert_allclose(losses_multi, losses_seq, rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_b.params["final_conv"]["kernel"]
                   if "final_conv" in state_b.params else
                   jax.tree_util.tree_leaves(state_b.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state_a.params)[0]),
        rtol=1e-3, atol=1e-6)
    assert int(state_b.step) == int(state_a.step) == 4
