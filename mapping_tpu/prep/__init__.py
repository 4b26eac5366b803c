"""Target preparation: COCO annotations -> mask / distance / size artifacts.

TPU-native rebuild of the reference's mask preparation (src/preparation.py):
the per-annotation EDT hot loop becomes a jitted scan over a padded object
stack on device; host code only decodes RLEs and writes files.
"""

from mapping_tpu.prep.targets import (
    prepare_image_targets,
    overlay_masks,
)

__all__ = ["prepare_image_targets", "overlay_masks"]
