"""Checkpointing: train-state serialization + best-by-metric policy.

Replaces the reference's two persistence layers (SURVEY.md §5): torch
state_dict checkpoints (`ModelCheckpoint`, src/steps/pytorch/callbacks.py:
244-279) and the Step transformer cache (src/steps/base.py:123-135). Here a
checkpoint is the full TrainState (params + batch_stats + optimizer state +
step) serialized with flax msgpack, so training resumes exactly.
"""

import os

import flax


def save_state(state, path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    data = flax.serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_state(state_template, path: str):
    """Restore into a freshly-created TrainState of identical structure."""
    with open(path, "rb") as f:
        data = f.read()
    payload = {
        "params": state_template.params,
        "batch_stats": state_template.batch_stats,
        "opt_state": state_template.opt_state,
        "step": state_template.step,
    }
    restored = flax.serialization.from_bytes(payload, data)
    return state_template.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def load_weights_only(state_template, path: str):
    """Weights-only restore (params + batch_stats) from EITHER checkpoint
    flavor — a full save_state file or a params-only file. Used by the
    warm-start path: a new training stage takes the previous stage's weights
    but a FRESH optimizer state and step counter (the reference's multistage
    recipe re-built the model and loaded only the state_dict per stage,
    README.md:86-91), so the saved opt_state — whose tree structure may not
    even match the new stage's schedule — is deliberately ignored."""
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    params = flax.serialization.from_state_dict(
        state_template.params, raw["params"])
    batch_stats = flax.serialization.from_state_dict(
        state_template.batch_stats, raw.get("batch_stats", {}))
    return state_template.replace(params=params, batch_stats=batch_stats)


def save_params_only(state, path: str):
    """Inference-weight checkpoint (params + batch_stats)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = flax.serialization.to_bytes(
        {"params": state.params, "batch_stats": state.batch_stats})
    with open(path, "wb") as f:
        f.write(data)


def load_params_only(state_template, path: str):
    with open(path, "rb") as f:
        data = f.read()
    restored = flax.serialization.from_bytes(
        {"params": state_template.params,
         "batch_stats": state_template.batch_stats}, data)
    return state_template.replace(params=restored["params"],
                                  batch_stats=restored["batch_stats"])
