"""Resume accounting (VERDICT r2 weak #4): a run killed at epoch k resumes
the epoch SCHEDULE at k+1 — it does not train `epochs` more — and the
best-checkpoint / early-stopping state survives the kill."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mapping_tpu.train.trainer import UNetTrainer

pytestmark = pytest.mark.slow


def _make_trainer(epochs, callbacks_config):
    return UNetTrainer(
        model_params={"encoder": "from_scratch", "n_filters": 4,
                      "repeat_blocks": 2, "dtype": jnp.float32},
        optimizer_params={"lr": 1e-2},
        loss_params={"imsize": (32, 32)},
        training_config={"epochs": epochs},
        callbacks_config=callbacks_config,
        loss_name="ce",
        input_size=(32, 32),
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


def test_resume_continues_epoch_schedule(tmp_path):
    ck_dir = str(tmp_path / "ck")
    cc = dict(checkpoint_dir=ck_dir, resume=True, resume_every=1,
              patience=100, minimize=True, validate_with_map=False,
              best_write_every=1)
    datagen = _datagen()

    # "killed" run: 3 of the planned 5 epochs completed (kill at an epoch
    # boundary == the resume checkpoint's granularity)
    t1 = _make_trainer(epochs=3, callbacks_config=cc)
    t1.fit(datagen, validation_datagen=datagen)
    assert int(np.asarray(t1.state.step)) == 3  # 1 step/epoch

    aux_path = os.path.join(ck_dir, "last.msgpack.aux.json")
    assert os.path.exists(aux_path)
    with open(aux_path) as f:
        aux = json.load(f)
    assert aux["epoch_id"] == 2
    assert "EarlyStopping" in aux["callbacks"]
    assert aux["callbacks"]["EarlyStopping"]["best"] is not None
    best_before = aux["callbacks"]["ModelCheckpoint"]["best"]

    # resumed run with the full schedule: must train exactly the 2 remaining
    # epochs (total optimizer steps == 5), NOT 5 more
    t2 = _make_trainer(epochs=5, callbacks_config=cc)
    t2.fit(datagen, validation_datagen=datagen)
    assert int(np.asarray(t2.state.step)) == 5

    # best-checkpoint accounting carried over (loss decreases on this toy
    # problem, so best should improve or persist — never reset to None)
    with open(aux_path) as f:
        aux2 = json.load(f)
    assert aux2["epoch_id"] == 4
    best_after = aux2["callbacks"]["ModelCheckpoint"]["best"]
    assert best_after is not None
    if best_before is not None:
        assert best_after <= best_before + 1e-9

    # best weights exist on disk
    assert os.path.exists(os.path.join(ck_dir, "best.msgpack"))


def test_completed_run_does_not_retrain(tmp_path):
    """fit() on a schedule that already finished trains zero extra epochs."""
    ck_dir = str(tmp_path / "ck")
    cc = dict(checkpoint_dir=ck_dir, resume=True, resume_every=1,
              patience=100, minimize=True, validate_with_map=False)
    datagen = _datagen()
    t1 = _make_trainer(epochs=3, callbacks_config=cc)
    t1.fit(datagen, validation_datagen=datagen)
    t2 = _make_trainer(epochs=3, callbacks_config=cc)
    t2.fit(datagen, validation_datagen=datagen)
    assert int(np.asarray(t2.state.step)) == 3
