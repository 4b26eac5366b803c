"""Segmentation losses: plain CE, distance/size-weighted CE, soft dice, mixer.

Parity targets (formulas reproduced exactly, layout changed to NHWC):
- multiclass_segmentation_loss — plain CE (reference
  src/steps/pytorch/validation.py:25-28).
- weighted CE with per-pixel weights = distance_weights x size_weights where
  distance w = 1 + w0*exp(-d^2/sigma^2) (1 inside objects) and size
  w = C/size with C = sqrt(H*W)/2 (reference src/models.py:339-381).
- DiceLoss = 1 - (2*sum(p*t)+smooth)/(sum(p)+sum(t)+smooth+eps)
  (src/steps/pytorch/validation.py:8-16) summed per class with background
  excluded (src/models.py:421-454).
- mixed loss = dice_weight*dice + cross_entropy_weight*ce
  (src/models.py:384-418).

All weight math runs in float32: the w0*exp(-d^2/sigma^2) term spans orders
of magnitude and would collapse in bf16 (SURVEY.md §7 hard part 6).

Conventions: logits (N, H, W, C) float; integer class target (N, H, W);
weighted targets are stacked along the channel axis as
(N, H, W, 1+K) = [mask, distance, size] matching the loader's target concat
(reference src/loaders.py:165).
"""

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _per_pixel_ce(logits, labels):
    """Softmax cross-entropy per pixel, f32.

    The label pick is a one-hot contraction, NOT take_along_axis: a per-pixel
    gather lowers to scatter-add in the backward pass, which runs scalar on
    TPU (~55 ms/step at batch 64 vs ~2 ms for the multiply form)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), logits.shape[-1],
                            dtype=logp.dtype)
    return -jnp.sum(logp * onehot, axis=-1)


def multiclass_segmentation_loss(logits, target):
    """Mean softmax CE; target (N, H, W) int or (N, H, W, 1)."""
    if target.ndim == logits.ndim:
        target = target[..., 0]
    return jnp.mean(_per_pixel_ce(logits, target))


def _distance_weights(d, w0, sigma):
    w = 1.0 + w0 * jnp.exp(-(d.astype(jnp.float32) ** 2) / (sigma**2))
    return jnp.where(d == 0, 1.0, w)


def _size_weights(sizes, c):
    s = jnp.where(sizes == 0, 1.0, sizes.astype(jnp.float32))
    return jnp.where(s == 1, 1.0, c / s)


def get_weights(weight_channels, w0, sigma, imsize):
    """Per-pixel CE weights from [distance, size] channels (..., H, W, 2).

    Reference get_weights (src/models.py:339-381): w1 (class-balance) is 1.
    """
    c = jnp.sqrt(jnp.float32(imsize[0] * imsize[1])) / 2.0
    d = weight_channels[..., 0]
    sizes = weight_channels[..., 1]
    return _distance_weights(d, w0, sigma) * _size_weights(sizes, c)


def multiclass_weighted_cross_entropy(logits, target, weights_function=None):
    """Weighted CE: target (N, H, W, 1+K); channel 0 = class mask, channels
    1..K feed weights_function (or channel 1 is the weight directly).

    (Reference src/models.py:310-337.)
    """
    if weights_function is None:
        weights = target[..., 1].astype(jnp.float32)
    else:
        weights = weights_function(target[..., 1:])
    labels = target[..., 0].astype(jnp.int32)
    return jnp.mean(_per_pixel_ce(logits, labels) * weights)


def dice_loss(probs, target, smooth=0.0, eps=1e-7):
    """1 - 2|p∩t| / (|p|+|t|), batch-global sums (reference DiceLoss)."""
    probs = probs.astype(jnp.float32)
    target = target.astype(jnp.float32)
    num = 2.0 * jnp.sum(probs * target) + smooth
    den = jnp.sum(probs) + jnp.sum(target) + smooth + eps
    return 1.0 - num / den


def multiclass_dice_loss(logits, target, smooth=0.0, activation="softmax",
                         excluded_classes: Sequence[int] = ()):
    """Sum of per-class dice over non-excluded channels (reference
    src/models.py:421-454). target: (N, H, W) int."""
    if activation == "softmax":
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    elif activation == "sigmoid":
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    else:
        raise NotImplementedError("only sigmoid and softmax are implemented")
    loss = 0.0
    for class_nr in range(logits.shape[-1]):
        if class_nr in excluded_classes:
            continue
        loss += dice_loss(probs[..., class_nr], target == class_nr, smooth)
    return loss


def mixed_dice_cross_entropy_loss(
    logits,
    target,
    dice_weight=0.5,
    cross_entropy_weight=0.5,
    smooth=0.0,
    dice_activation="softmax",
    cross_entropy_loss: Optional[Callable] = None,
    excluded_classes: Sequence[int] = (0,),
):
    """dice_weight*dice + ce_weight*ce (reference src/models.py:384-418).

    target: (N, H, W, 1+K) stacked [mask, weight channels...]; the dice term
    always uses channel 0, the CE term gets the full stack when weighted.
    """
    mask = target[..., 0].astype(jnp.int32)
    dice = multiclass_dice_loss(logits, mask, smooth, dice_activation,
                                excluded_classes)
    if cross_entropy_loss is None:
        ce = multiclass_segmentation_loss(logits, mask)
    else:
        ce = cross_entropy_loss(logits, target)
    return dice_weight * dice + cross_entropy_weight * ce


def make_loss_fn(loss_name: str, params: dict) -> Callable:
    """Build the configured loss (reference PyTorchUNet/-Weighted transformer
    constructors, src/models.py:104-107,149-161).

    loss_name: 'ce' (plain) or 'weighted' (distance/size weighted CE + dice).
    params for 'weighted': w0, sigma, imsize, dice_weight, bce_weight,
    smooth, dice_activation.
    """
    if loss_name == "ce":
        def plain(logits, target):
            if target.ndim == logits.ndim:
                target = target[..., 0].astype(jnp.int32)
            return multiclass_segmentation_loss(logits, target)
        return plain
    if loss_name == "weighted":
        weights_function = partial(
            get_weights,
            w0=params.get("w0", 50.0),
            sigma=params.get("sigma", 10.0),
            imsize=params.get("imsize", (256, 256)),
        )
        weighted_ce = partial(multiclass_weighted_cross_entropy,
                              weights_function=weights_function)
        return partial(
            mixed_dice_cross_entropy_loss,
            dice_weight=params.get("dice_weight", 0.2),
            cross_entropy_weight=params.get("bce_weight", 1.0),
            smooth=params.get("smooth", 0.0),
            dice_activation=params.get("dice_activation", "softmax"),
            cross_entropy_loss=weighted_ce,
        )
    raise KeyError(f"unknown loss {loss_name!r}")
