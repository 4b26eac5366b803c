"""Inference-time BatchNorm folding (BASELINE north star / SURVEY §7 ph. 1).

At inference BN is an affine map with frozen statistics; folding it into the
preceding convolution (w' = w * g/sqrt(v+eps) per output channel,
b' = beta - mean * g/sqrt(v+eps)) removes every BN elementwise pass — and,
because BN here runs in float32 between bfloat16 convs, also removes the
f32 round-trips from the compiled forward. The reference paid this cost on
every cuDNN conv (src/unet_models.py forward everywhere, via torchvision
BatchNorm2d layers).

The folded *module* variant is built with `fold_bn=True` (models/resnet.py
conv_bn): biased convs, no BatchNorm. This file produces the matching params
tree from a trained (params, batch_stats) pair. Folding happens in float32 on
the stored parameters, so the only numerical delta vs the unfolded forward is
where the scale multiplication lands relative to the bf16 cast (~bf16 eps).

Naming convention (matches torchvision paths kept by models/resnet.py):
`convN` pairs with sibling `bnN`; `downsample_conv` with `downsample_bn`;
the stem `conv1` with `bn1`.
"""

from typing import Any, Dict, Tuple

import jax.numpy as jnp

_EPS = 1e-5


def _bn_sibling(conv_name: str):
    if conv_name == "downsample_conv":
        return "downsample_bn"
    if conv_name.startswith("conv") and conv_name[4:].isdigit():
        return "bn" + conv_name[4:]
    return None


def can_fold(model) -> bool:
    """True if the module family supports the folded variant."""
    return "fold_bn" in getattr(model, "__dataclass_fields__", {})


def fold_batch_stats(params: Dict[str, Any], batch_stats: Dict[str, Any],
                     eps: float = _EPS) -> Dict[str, Any]:
    """(params, batch_stats) of the standard model -> params tree for the
    fold_bn=True variant. Subtrees without conv/bn pairs pass through."""

    def fold(p, s):
        out = {}
        folded_bns = set()
        for k, v in p.items():
            if not isinstance(v, dict):
                out[k] = v
                continue
            bn_key = _bn_sibling(k)
            if bn_key and bn_key in p and "kernel" in v:
                bn_p = p[bn_key]
                bn_s = s.get(bn_key, {})
                if "mean" not in bn_s:
                    # conv with a numeric suffix but no BN stats (e.g. VGG
                    # convs already carry biases): pass through untouched
                    out[k] = v
                    continue
                scale = (bn_p["scale"] *
                         jnp.reciprocal(jnp.sqrt(bn_s["var"] + eps)))
                kernel = v["kernel"] * scale  # HWIO: broadcasts over O
                bias = bn_p["bias"] - bn_s["mean"] * scale
                if "bias" in v:
                    bias = bias + v["bias"] * scale
                out[k] = {"kernel": kernel, "bias": bias}
                folded_bns.add(bn_key)
            elif "kernel" in v or "scale" in v or "embedding" in v:
                out[k] = v  # leaf module (incl. BN that has no conv partner)
            else:
                out[k] = fold(v, s.get(k, {}))
        for bn in folded_bns:
            out.pop(bn, None)
        return out

    return fold(params, batch_stats or {})


def folded_inference_model(model, params, batch_stats) -> Tuple[Any, Dict]:
    """Clone `model` with fold_bn=True and fold its parameters.

    Returns (folded_model, folded_params). Raises ValueError for families
    without a folded variant — callers fall back to the standard path."""
    if not can_fold(model):
        raise ValueError(f"{type(model).__name__} has no fold_bn variant")
    return model.clone(fold_bn=True), fold_batch_stats(params, batch_stats)
