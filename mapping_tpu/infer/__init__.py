"""Fused inference: forward -> softmax -> (TTA) -> resize -> threshold ->
morphology -> CCL -> per-instance scores, one jitted program; only compact
RLE bytes leave the device (SURVEY.md §7 phase 6).
"""

from mapping_tpu.infer.postprocess import fused_postprocess, postprocess_probabilities
from mapping_tpu.infer.annotations import create_annotations, labeled_to_annotations
from mapping_tpu.infer.serving import FusedServe


def load_artifact(directory):
    """Lazy re-export of infer.artifact.load_artifact (pulls in jax.export
    only when AOT serving is actually used)."""
    from mapping_tpu.infer.artifact import load_artifact as _load

    return _load(directory)


__all__ = [
    "fused_postprocess",
    "postprocess_probabilities",
    "create_annotations",
    "labeled_to_annotations",
    "FusedServe",
    "load_artifact",
]
