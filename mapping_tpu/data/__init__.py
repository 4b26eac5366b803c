"""Host-side data layer: COCO index, metadata tables, batch loaders.

Host code only decodes and batches; all augmentation/normalization runs
on-device (mapping_tpu.data.augment) — the TPU-native replacement for the
reference's DataLoader worker processes doing PIL/imgaug transforms
(reference: src/loaders.py, SURVEY.md §2c).
"""

from mapping_tpu.data.coco import COCOIndex
from mapping_tpu.data.metadata import generate_inference_metadata, generate_metadata

__all__ = ["COCOIndex", "generate_metadata", "generate_inference_metadata"]
