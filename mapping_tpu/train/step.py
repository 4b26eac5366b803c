"""Jitted train / eval / predict steps.

The reference's hot loop is host-driven: H2D copy, forward, loss, backward,
Adam step, loss D2H per batch (src/steps/pytorch/models.py:76-113). Here each
of those is one compiled XLA program; with a mesh, the batch is sharded over
'data' and XLA reduces gradients over ICI (SURVEY.md §2g). Only the scalar
metrics dict leaves the device.
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mapping_tpu.parallel.mesh import shard_batch, shard_pytree_replicated


def _train_step_body(loss_fn: Callable, has_batch_stats: bool,
                     remat: bool):
    """Un-jitted (state, batch) -> (state, metrics) body shared by the
    single-step and scanned multi-step programs."""

    def train_step(state, batch):
        dropout_rng = state.next_dropout_rng()

        def forward(params, images):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                return state.apply_fn(
                    variables, images, train=True,
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            logits = state.apply_fn(
                variables, images, train=True, rngs={"dropout": dropout_rng})
            return logits, {}

        if remat:
            forward = jax.checkpoint(forward)

        def compute_loss(params):
            logits, new_model_state = forward(params, batch["image"])
            if isinstance(logits, (list, tuple)):
                # multi-head model (UNetMultitask): average the per-head
                # losses; with a list target each head gets its own
                # (reference multi-output loop, steps/pytorch/models.py:88-99)
                targets = batch["target"]
                if not isinstance(targets, (list, tuple)):
                    targets = [targets] * len(logits)
                loss = sum(loss_fn(lg, tg) for lg, tg in
                           zip(logits, targets)) / len(logits)
            else:
                loss = loss_fn(logits, batch["target"])
            return loss, new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if has_batch_stats:
            state = state.replace(batch_stats=new_model_state["batch_stats"])
        return state, {"loss": loss}

    return train_step


def make_train_step(loss_fn: Callable, has_batch_stats: bool = True,
                    remat: bool = False):
    """Returns jitted (state, batch) -> (state, metrics).

    batch: {'image': (N, H, W, 3) f32, 'target': (N, H, W, 1+K)}.
    loss_fn(logits, target) -> scalar.

    The old state's buffers are donated — params/opt-state update in place in
    HBM instead of being copied (the torch loop mutated in place too;
    donation is the jit-world equivalent). remat=True wraps the forward in
    jax.checkpoint, trading recompute for activation memory at large batch.
    """
    body = _train_step_body(loss_fn, has_batch_stats, remat)
    return partial(jax.jit, donate_argnums=(0,))(body)


def make_train_step_multi(loss_fn: Callable, has_batch_stats: bool = True,
                          remat: bool = False):
    """Returns jitted (state, batches) -> (state, metrics) running K
    optimizer steps per dispatch via lax.scan.

    batches: pytree with a leading (K, ...) axis stacking K host batches.
    metrics['loss'] is the (K,) per-step loss vector. The trajectory matches
    K single-step dispatches up to XLA fusion/reassociation noise (dropout
    keys derive from state.step, so randomness is identical). Motivation: a host-driven per-batch loop pays the device
    dispatch latency every step — ~32 ms through the attached chip's tunnel,
    ~30% of a ResNet101/256²/batch-20 step; a production host loop pays
    less but never nothing.
    """
    body = _train_step_body(loss_fn, has_batch_stats, remat)

    @partial(jax.jit, donate_argnums=(0,))
    def train_steps(state, batches):
        def scan_body(st, batch):
            st2, metrics = body(st, batch)
            return st2, metrics["loss"]

        state, losses = jax.lax.scan(scan_body, state, batches)
        return state, {"loss": losses}

    return train_steps


def make_eval_step(loss_fn: Callable):
    """Returns jitted (state, batch) -> scalar validation loss (the
    reference's score_model, src/steps/pytorch/validation.py:51-84)."""

    @jax.jit
    def eval_step(state, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = state.apply_fn(variables, batch["image"], train=False)
        return loss_fn(logits, batch["target"])

    return eval_step


def make_predict_step(apply_fn: Optional[Callable] = None):
    """Returns jitted (state, images) -> class probabilities (N, H, W, C).

    The reference computes softmax on host numpy after D2H
    (src/models.py:88-92); here it fuses into the forward program.
    """

    @jax.jit
    def predict_step(state, images):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fn = apply_fn or state.apply_fn
        logits = fn(variables, images, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return predict_step


def place_for_mesh(state, batch, mesh):
    """Replicate state, shard batch over 'data' — jit then compiles the step
    as one SPMD program over the mesh."""
    return (
        shard_pytree_replicated(state, mesh),
        shard_batch(batch, mesh),
    )
