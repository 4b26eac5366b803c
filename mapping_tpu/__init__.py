"""mapping_tpu — TPU-native instance-segmentation framework.

A from-scratch JAX/Flax/pjit/Pallas rebuild of the capabilities of
neptune-ai/open-solution-mapping-challenge (reference mounted at
/root/reference): U-Net building segmentation on satellite tiles, with
distance/size-weighted losses, TTA, fused on-device postprocessing to COCO
RLE, and a modified-COCOeval AP/AR metric.

Design stance (see SURVEY.md §7): the reference shuttles per-image numpy
between host-Python DAG steps; here the train step and the
predict+postprocess path are single jitted programs sharded over a
`jax.sharding.Mesh`, with a thin functional pipeline layer for
composition/caching around them.
"""

__version__ = "0.1.0"
