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
