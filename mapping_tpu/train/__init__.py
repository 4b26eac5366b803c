"""Training layer: losses, train state, pjit-sharded train/eval steps.

Replaces the reference's host-side torch training loop
(src/steps/pytorch/models.py:50-113) with a single jitted SPMD program per
step: batch sharded over the mesh 'data' axis, parameters replicated,
gradients reduced over ICI by XLA-inserted collectives.
"""

from mapping_tpu.train.losses import (
    dice_loss,
    get_weights,
    mixed_dice_cross_entropy_loss,
    multiclass_dice_loss,
    multiclass_segmentation_loss,
    multiclass_weighted_cross_entropy,
    make_loss_fn,
)
from mapping_tpu.train.state import TrainState, create_train_state
from mapping_tpu.train.step import make_eval_step, make_predict_step, make_train_step

__all__ = [
    "dice_loss",
    "get_weights",
    "mixed_dice_cross_entropy_loss",
    "multiclass_dice_loss",
    "multiclass_segmentation_loss",
    "multiclass_weighted_cross_entropy",
    "make_loss_fn",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_predict_step",
]
