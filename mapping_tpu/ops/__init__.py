"""Device-side ops library: the XLA/Pallas kernels replacing the reference's
host-side scipy/skimage/cv2/pycocotools hot loops (SURVEY.md §2h)."""

from mapping_tpu.ops.ccl import connected_components
from mapping_tpu.ops.crf import dense_crf, dense_crf_batch
from mapping_tpu.ops.morphology import erode, dilate
from mapping_tpu.ops.resize import resize_chw, resize_hw
from mapping_tpu.ops.edt import edt, distance_stack_top2
from mapping_tpu.ops.instance import instance_scores, instance_areas

__all__ = [
    "connected_components",
    "dense_crf",
    "dense_crf_batch",
    "erode",
    "dilate",
    "resize_chw",
    "resize_hw",
    "edt",
    "distance_stack_top2",
    "instance_scores",
    "instance_areas",
]
