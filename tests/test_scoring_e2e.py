"""Scoring-model pipelines end-to-end on the synthetic fixture:
train scoring_model (category_layers [1, 19]) then unet_scoring_model
inference with NMS (reference flow, src/pipelines.py:307-392)."""

import os

import numpy as np
import pytest
import yaml

from tests.fixtures.synthetic import generate

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("scoring_e2e")
    data_dir = os.path.join(str(root), "data")
    generate(data_dir, n_train=6, n_val=3, seed=33)
    params = {
        "data_dir": data_dir,
        "meta_dir": os.path.join(str(root), "meta"),
        "experiment_dir": os.path.join(str(root), "experiment"),
        "encoder": "from_scratch",
        "n_filters": 8,
        "repeat_blocks": 2,
        "image_h": 64,
        "image_w": 64,
        "batch_size_train": 3,
        "batch_size_inference": 3,
        "epochs_nr": 8,
        "lr": 0.003,
        "patience": 100,
        "validate_with_map": 1,
        "evaluation_data_sample": 3,
        "scoring_model__num_training_examples": 6,
        "lgbm__number_of_trees": 50,
    }
    config_path = os.path.join(str(root), "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump({"parameters": params}, f)
    return {"root": str(root), "config": config_path}


def test_scoring_model_cycle(workspace):
    from mapping_tpu.manager import PipelineManager

    # 1) prepare + train the base unet with [1, 1]
    manager = PipelineManager(workspace["config"])
    manager.prepare_masks(dev_mode=False)
    manager.prepare_metadata(train_data=True, valid_data=True)
    manager.train("unet", dev_mode=False)

    # 2) guard asserts: scoring needs [1, 19], base needs [1, 1]
    with pytest.raises(AssertionError):
        manager.train("scoring_model", dev_mode=False)
    manager_19 = PipelineManager(workspace["config"],
                                 overrides={"category_layers": [1, 19]})
    with pytest.raises(AssertionError):
        manager_19.train("unet", dev_mode=False)

    # 3) train the scoring model over 19 threshold layers
    manager_19.train("scoring_model", dev_mode=False)
    assert os.path.exists(os.path.join(
        manager_19.params.experiment_dir, "transformers",
        "scoring_model.joblib"))

    # 4) evaluate through the scoring pipeline (features -> predicted IoU ->
    #    NMS across threshold layers)
    ap, ar = manager_19.evaluate("unet_scoring_model", dev_mode=False,
                                 chunk_size=None)
    assert np.isfinite(ap) and np.isfinite(ar)
    assert ap > 0.2, f"scoring-pipeline AP too low: {ap}"
