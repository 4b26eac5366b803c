"""Full reference-checkpoint import surface (VERDICT r3 next #2): the
reference's deliverable is a complete trained UNet state_dict
(src/steps/pytorch/utils.py:67-75); `import_checkpoint` must convert it into
the experiment's transformer cache in every rehearsed file format so
`evaluate` scores the reference's trained weights directly."""

import os

import numpy as np
import pytest
import torch
import yaml

import jax.numpy as jnp

from tests.fixtures.synthetic import generate
from tests.torch_ref_models import TorchUNetResNet, randomize_bn_stats

pytestmark = pytest.mark.slow

torch.set_num_threads(2)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("import_ckpt"))
    data_dir = os.path.join(root, "data")
    generate(data_dir, n_train=2, n_val=2, seed=5)
    params = {
        "data_dir": data_dir,
        "meta_dir": os.path.join(root, "meta"),
        "experiment_dir": os.path.join(root, "experiment"),
        "encoder": "ResNet34",
        "model_dtype": "float32",  # bit-faithful parity vs the torch oracle
        "image_h": 64,
        "image_w": 64,
        "batch_size_train": 2,
        "batch_size_inference": 2,
        "evaluation_data_sample": 2,
        "validate_with_map": 1,
    }
    config_path = os.path.join(root, "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"parameters": params}, f)

    torch.manual_seed(77)
    tmodel = randomize_bn_stats(
        TorchUNetResNet(34, num_classes=2, is_deconv=True), seed=77).eval()
    sd = tmodel.state_dict()
    ckpts = {}
    # the three file shapes real reference checkpoints come in
    ckpts["plain"] = os.path.join(root, "best_plain.torch")
    torch.save(sd, ckpts["plain"])
    ckpts["wrapped"] = os.path.join(root, "best_wrapped.torch")
    torch.save({"state_dict": sd, "epoch": 99}, ckpts["wrapped"])
    ckpts["dataparallel"] = os.path.join(root, "best_dp.torch")
    torch.save({"module." + k: v for k, v in sd.items()},
               ckpts["dataparallel"])
    return {"root": root, "config": config_path, "ckpts": ckpts,
            "tmodel": tmodel}


def test_import_all_file_formats_identical_cache(workspace):
    """plain / {'state_dict': ...} / 'module.'-prefixed all import to a
    bit-identical transformer cache."""
    from mapping_tpu.manager import PipelineManager

    blobs = {}
    for fmt, path in workspace["ckpts"].items():
        manager = PipelineManager(workspace["config"])
        manager.import_checkpoint(path)
        cache = os.path.join(manager.params.experiment_dir, "transformers",
                             "unet.msgpack")
        assert os.path.exists(cache), fmt
        with open(cache, "rb") as f:
            blobs[fmt] = f.read()
    assert blobs["plain"] == blobs["wrapped"] == blobs["dataparallel"]


def test_imported_weights_match_torch_forward(workspace):
    """The product serving path (cache -> trainer -> probs_apply_fn) on the
    imported checkpoint reproduces the torch model's softmax maps."""
    from mapping_tpu.manager import PipelineManager
    from mapping_tpu.pipelines import PIPELINES

    manager = PipelineManager(workspace["config"])
    manager.import_checkpoint(workspace["ckpts"]["plain"])

    pipeline = PIPELINES["unet"]["inference"](manager.config)
    pipeline.trainer.load(pipeline.trainer_cache_path)
    fn, get_params = pipeline.trainer.probs_apply_fn()

    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    probs = np.asarray(fn(get_params(), jnp.asarray(x)))
    with torch.no_grad():
        tlogits = workspace["tmodel"](
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        tprobs = torch.softmax(tlogits, dim=1).numpy()
    err = np.abs(probs - np.transpose(tprobs, (0, 2, 3, 1))).max()
    assert err < 2e-3, f"imported-checkpoint prob divergence {err}"


def test_imported_checkpoint_evaluates(workspace):
    """`import_checkpoint` then `evaluate` — the reference's drop-in
    deployment path — runs the full COCOeval protocol end to end."""
    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"])
    manager.prepare_masks(dev_mode=False)
    manager.prepare_metadata(train_data=True, valid_data=True)
    manager.import_checkpoint(workspace["ckpts"]["wrapped"])
    ap, ar = manager.evaluate("unet", dev_mode=False, chunk_size=None)
    # random weights: AP is meaningless, but the protocol must complete
    assert 0.0 <= ap <= 1.0 and 0.0 <= ar <= 1.0
    assert os.path.exists(os.path.join(manager.params.experiment_dir,
                                       "prediction.json"))


def test_import_checkpoint_guards_category_layers(workspace):
    """ADVICE r4: importing under a scoring-model-configured yaml
    (category_layers [1, 19]) must fail at import time with the same guard
    train/evaluate enforce, not later as a distant shape mismatch."""
    import pytest

    from mapping_tpu.manager import PipelineManager

    manager = PipelineManager(workspace["config"],
                              overrides={"category_layers": [1, 19]})
    with pytest.raises(AssertionError, match="category_layers"):
        manager.import_checkpoint(workspace["ckpts"]["wrapped"])


def test_parity_drill_end_to_end(workspace, tmp_path, monkeypatch):
    """VERDICT r4 next #8: the one-command parity drill —
    DATA_DIR=... CHECKPOINT=... parity_drill — must run import_checkpoint
    -> metadata scan -> evaluate and print the delta vs the published
    0.943/0.954, end to end on the synthetic fixture with a synthetic
    'reference' torch checkpoint. A fresh meta/experiment dir proves the
    drill self-bootstraps (no prepare_metadata needed beforehand)."""
    import json

    from click.testing import CliRunner

    from mapping_tpu.main import main

    # fresh dirs: only the fixture dataset + the torch checkpoint exist
    params = {
        "data_dir": "OVERRIDDEN-BY-ENV",
        "meta_dir": os.path.join(str(tmp_path), "meta"),
        "experiment_dir": os.path.join(str(tmp_path), "experiment"),
        "encoder": "ResNet34",
        "model_dtype": "float32",
        "image_h": 64,
        "image_w": 64,
        "batch_size_inference": 2,
        "evaluation_data_sample": 2,
    }
    config_path = os.path.join(str(tmp_path), "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"parameters": params}, f)

    monkeypatch.setenv("DATA_DIR",
                       os.path.join(workspace["root"], "data"))
    monkeypatch.setenv("CHECKPOINT", workspace["ckpts"]["wrapped"])
    runner = CliRunner()
    result = runner.invoke(main, ["--config", config_path, "parity_drill"])
    assert result.exit_code == 0, result.output
    report = json.loads(result.output[result.output.index("{"):])
    assert report["reference_ap"] == 0.943
    assert report["reference_ar"] == 0.954
    assert 0.0 <= report["ap"] <= 1.0
    assert report["delta_ap"] == round(report["ap"] - 0.943, 6)
    # untrained random weights: parity must honestly report False
    assert report["parity"] is False
    assert os.path.exists(os.path.join(params["experiment_dir"],
                                       "prediction.json"))
    assert os.path.exists(os.path.join(params["meta_dir"], "metadata.csv"))


def test_parity_drill_requires_checkpoint(tmp_path):
    from click.testing import CliRunner

    from mapping_tpu.main import main

    params = {"meta_dir": os.path.join(str(tmp_path), "m"),
              "experiment_dir": os.path.join(str(tmp_path), "e")}
    config_path = os.path.join(str(tmp_path), "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"parameters": params}, f)
    runner = CliRunner()
    result = runner.invoke(main, ["--config", config_path, "parity_drill"],
                           env={"CHECKPOINT": ""})
    assert result.exit_code != 0
    assert "checkpoint" in result.output.lower()


def test_import_checkpoint_cli_registered():
    from click.testing import CliRunner

    from mapping_tpu.main import main

    runner = CliRunner()
    assert "import_checkpoint" in runner.invoke(main, ["--help"]).output
    out = runner.invoke(main, ["import_checkpoint", "--help"]).output
    assert "--path" in out and "--pipeline_name" in out
