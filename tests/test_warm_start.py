"""Warm-start multistage training (VERDICT r3 next #1): the reference's
published 4-stage recipe (reference README.md:86-91 — rerun `train` with a
changed yaml, each stage continuing from the previous stage's weights) must
be EXECUTABLE: `warm_start: 1` (or `train --warm_start`) loads the cached
transformer and FITS under the new hyperparameters instead of
short-circuiting on the cache, archiving (never destroying) the completed
previous stage."""

import os

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapping_tpu.config import build_config
from mapping_tpu.pipelines import UNetPipeline
from mapping_tpu.train.trainer import UNetTrainer


def _make_trainer(epochs, lr=1e-2, callbacks_config=None):
    return UNetTrainer(
        model_params={"encoder": "from_scratch", "n_filters": 4,
                      "repeat_blocks": 2, "dtype": jnp.float32},
        optimizer_params={"lr": lr},
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


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_trainer_warm_start_loads_weights_fresh_optimizer(tmp_path):
    """warm_start(path) = previous stage's weights + step 0 + fresh opt."""
    datagen = _datagen()
    t1 = _make_trainer(epochs=2)
    t1.fit(datagen)
    cache = str(tmp_path / "unet.msgpack")
    t1.save(cache)

    t2 = _make_trainer(epochs=1, lr=1e-3)  # stage 2: different lr
    t2.warm_start(cache)
    t2._ensure_state()
    assert t2.warm_started_from == cache
    assert int(np.asarray(t2.state.step)) == 0  # fresh schedule
    for a, b in zip(_leaves(t2.state.params), _leaves(t1.state.params)):
        np.testing.assert_allclose(a, b)

    # the stage-2 fit actually trains, starting from those weights
    t2.fit(datagen)
    assert int(np.asarray(t2.state.step)) == 1
    diffs = [np.abs(a - b).max()
             for a, b in zip(_leaves(t2.state.params),
                             _leaves(t1.state.params))]
    assert max(diffs) > 0


def test_trainer_warm_start_after_state_exists(tmp_path):
    """warm_start called on an already-initialized trainer applies now."""
    datagen = _datagen()
    t1 = _make_trainer(epochs=1)
    t1.fit(datagen)
    cache = str(tmp_path / "unet.msgpack")
    t1.save(cache)

    t2 = _make_trainer(epochs=1)
    t2._ensure_state()
    before_version = t2._state_version
    t2.warm_start(cache)
    assert t2._state_version == before_version + 1
    for a, b in zip(_leaves(t2.state.params), _leaves(t1.state.params)):
        np.testing.assert_allclose(a, b)


def _stage_pipeline(tmp_path, **param_overrides):
    params = {"experiment_dir": str(tmp_path / "experiment"),
              "encoder": "from_scratch", "n_filters": 4, "repeat_blocks": 2,
              "image_h": 32, "image_w": 32, "warm_start": 1}
    params.update(param_overrides)
    config = build_config(None, overrides=params)
    return UNetPipeline(config, train_mode=True)


def test_begin_stage_archives_completed_stage(tmp_path):
    """A COMPLETED previous stage (STAGE_COMPLETE marker) is archived:
    checkpoints -> <dir>.stage1, weights -> unet.stage1.msgpack."""
    p = _stage_pipeline(tmp_path)
    ck = p._checkpoint_dir
    os.makedirs(ck)
    with open(os.path.join(ck, "last.msgpack"), "wb") as f:
        f.write(b"stage1-resume")
    with open(p._stage_marker, "w") as f:
        f.write("stage complete\n")
    os.makedirs(os.path.dirname(p.trainer_cache_path))
    with open(p.trainer_cache_path, "wb") as f:
        f.write(b"stage1-weights")

    p._begin_stage()
    assert not os.path.exists(ck)  # moved, so resume starts a fresh schedule
    assert os.path.exists(os.path.join(f"{ck}.stage1", "last.msgpack"))
    archived = p.trainer_cache_path[:-len(".msgpack")] + ".stage1.msgpack"
    with open(archived, "rb") as f:
        assert f.read() == b"stage1-weights"
    # live cache untouched (it is the warm-start source until stage 2 saves)
    with open(p.trainer_cache_path, "rb") as f:
        assert f.read() == b"stage1-weights"
    assert p.trainer._warm_start_path == p.trainer_cache_path


def test_begin_stage_leaves_killed_stage_in_place(tmp_path):
    """An IN-PROGRESS stage (resume sidecar, no marker, archived
    predecessors — archiving precedes fitting, so a killed warm-started
    stage always has them) is NOT archived: rerunning the same warm-start
    command resumes its own schedule."""
    p = _stage_pipeline(tmp_path)
    ck = p._checkpoint_dir
    os.makedirs(ck)
    with open(os.path.join(ck, "last.msgpack"), "wb") as f:
        f.write(b"stage2-partial")
    os.makedirs(f"{ck}.stage1")  # stage 1's archive, made when stage 2 began
    os.makedirs(os.path.dirname(p.trainer_cache_path))
    with open(p.trainer_cache_path, "wb") as f:
        f.write(b"stage1-weights")

    p._begin_stage()
    assert os.path.exists(os.path.join(ck, "last.msgpack"))
    assert not os.path.isdir(f"{ck}.stage2")
    assert p.trainer._warm_start_path == p.trainer_cache_path


def test_begin_stage_archives_legacy_pre_marker_stage(tmp_path):
    """A checkpoint dir with NO marker, NO stage archives and NO resume
    sidecar predates the STAGE_COMPLETE marker (legacy completed stage
    whose resume was off or cleaned): treated as completed and archived."""
    p = _stage_pipeline(tmp_path)
    ck = p._checkpoint_dir
    os.makedirs(ck)
    with open(os.path.join(ck, "best.msgpack"), "wb") as f:
        f.write(b"legacy-best")
    os.makedirs(os.path.dirname(p.trainer_cache_path))
    with open(p.trainer_cache_path, "wb") as f:
        f.write(b"legacy-weights")

    p._begin_stage()
    # archived exactly like a marked completed stage: checkpoints moved
    # out of the live dir, weights copied, cache untouched
    assert not os.path.exists(ck)
    assert os.path.exists(os.path.join(f"{ck}.stage1", "best.msgpack"))
    archived = p.trainer_cache_path[:-len(".msgpack")] + ".stage1.msgpack"
    with open(archived, "rb") as f:
        assert f.read() == b"legacy-weights"
    with open(p.trainer_cache_path, "rb") as f:
        assert f.read() == b"legacy-weights"
    assert p.trainer._warm_start_path == p.trainer_cache_path


def test_begin_stage_refuses_ambiguous_markerless_sidecar(tmp_path):
    """ADVICE r4: a markerless, archive-less checkpoint dir WITH a resume
    sidecar is ambiguous — either a pre-marker completed stage, or a killed
    warm-start stage whose archives were manually removed. Archiving would
    silently restart an in-progress stage; leaving it would let the stale
    sidecar hijack the fresh schedule. _begin_stage must refuse with
    disambiguation instructions, touching nothing on disk."""
    import pytest

    p = _stage_pipeline(tmp_path)
    ck = p._checkpoint_dir
    os.makedirs(ck)
    with open(os.path.join(ck, "last.msgpack"), "wb") as f:
        f.write(b"ambiguous-resume")
    os.makedirs(os.path.dirname(p.trainer_cache_path))
    with open(p.trainer_cache_path, "wb") as f:
        f.write(b"weights")

    with pytest.raises(RuntimeError, match="resume sidecar"):
        p._begin_stage()
    # nothing archived, nothing deleted
    assert os.path.exists(os.path.join(ck, "last.msgpack"))
    assert not os.path.isdir(f"{ck}.stage1")
    with open(p.trainer_cache_path, "rb") as f:
        assert f.read() == b"weights"


def test_warm_start_overwrite_mutually_exclusive(tmp_path):
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(None, overrides={
        "experiment_dir": str(tmp_path / "experiment"),
        "meta_dir": str(tmp_path / "meta"),
        "overwrite": 1})
    with pytest.raises(ValueError, match="mutually exclusive"):
        manager.train("unet", dev_mode=True, warm_start=True)


@pytest.mark.slow
def test_multistage_recipe_executes(tmp_path):
    """REPRODUCE.md's multistage procedure as written: stage 1 trains, stage
    2 with changed lr/dice_mask into the SAME experiment actually fits
    (fresh step counter advanced), starts from stage-1 weights, archives
    stage 1, and does not regress validation AP on the easy synthetic set."""
    import yaml

    from mapping_tpu.manager import PipelineManager
    from tests.fixtures.synthetic import generate

    data_dir = str(tmp_path / "data")
    generate(data_dir, n_train=8, n_val=4, seed=21)
    params = {
        "data_dir": data_dir,
        "meta_dir": str(tmp_path / "meta"),
        "experiment_dir": str(tmp_path / "experiment"),
        "encoder": "from_scratch",
        "n_filters": 8,
        "repeat_blocks": 2,
        "image_h": 64,
        "image_w": 64,
        "batch_size_train": 4,
        "batch_size_inference": 4,
        "epochs_nr": 4,
        "lr": 0.003,
        "gamma": 1.0,
        "patience": 100,
        "validate_with_map": 1,
        "evaluation_data_sample": 4,
        "resume_every": 1,
    }
    config_path = str(tmp_path / "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"parameters": params}, f)

    # ---- stage 1 -------------------------------------------------------
    m1 = PipelineManager(config_path)
    m1.prepare_masks(dev_mode=False)
    m1.prepare_metadata(train_data=True, valid_data=True)
    m1.train("unet", dev_mode=False)
    cache = os.path.join(params["experiment_dir"], "transformers",
                         "unet.msgpack")
    with open(cache, "rb") as f:
        stage1_bytes = f.read()
    marker = os.path.join(params["experiment_dir"], "checkpoints", "unet",
                          "STAGE_COMPLETE")
    assert os.path.exists(marker)
    ap1, _ = m1.evaluate("unet", dev_mode=False, chunk_size=None)

    # rerunning train WITHOUT warm_start keeps the documented short-circuit
    m1b = PipelineManager(config_path)
    m1b.train("unet", dev_mode=False)
    with open(cache, "rb") as f:
        assert f.read() == stage1_bytes

    # ---- stage 2: same experiment, new hyperparameters ------------------
    m2 = PipelineManager(config_path, overrides={
        "warm_start": 1, "epochs_nr": 8, "lr": 0.001, "dice_mask": 0.5})
    m2.train("unet", dev_mode=False)

    # the stage-2 run actually fit: fresh schedule ran all 8 epochs
    # (8 train imgs / batch 4 = 2 steps per epoch)
    with open(cache, "rb") as f:
        stage2_bytes = f.read()
    assert stage2_bytes != stage1_bytes
    state = flax.serialization.msgpack_restore(stage2_bytes)
    assert int(np.asarray(state["step"])) == 16

    # stage 1 archived, bit-identical, in both places
    archived = cache[:-len(".msgpack")] + ".stage1.msgpack"
    with open(archived, "rb") as f:
        assert f.read() == stage1_bytes
    assert os.path.isdir(os.path.join(params["experiment_dir"], "checkpoints",
                                      "unet.stage1"))

    # quality did not regress with the extra stage of training
    ap2, _ = m2.evaluate("unet", dev_mode=False, chunk_size=None)
    assert ap2 >= ap1 - 1e-6, (ap1, ap2)
    assert ap2 > 0.3


def test_manager_train_does_not_leak_warm_start_flag(tmp_path, monkeypatch):
    """warm_start=True is scoped to the single train() call: config.params
    is shared state, and a later train() on the same manager must not
    silently warm-start (archive + refit) because an earlier call asked."""
    import mapping_tpu.manager as mgr

    seen = []
    monkeypatch.setattr(
        mgr, "train",
        lambda name, dev, config: seen.append(
            config.params.get("warm_start", 0)))
    manager = mgr.PipelineManager(None, overrides={
        "experiment_dir": str(tmp_path / "experiment"),
        "meta_dir": str(tmp_path / "meta")})
    manager.train("unet", dev_mode=True, warm_start=True)
    assert seen == [1]
    assert manager.config.params.get("warm_start", 0) == 0
    manager.train("unet", dev_mode=True)
    assert seen == [1, 0]
