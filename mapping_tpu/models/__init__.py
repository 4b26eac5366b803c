"""Flax model zoo: U-Nets with ResNet/VGG encoders plus a parametric scratch
U-Net, mirroring the reference's PRETRAINED_NETWORKS registry
(reference: src/models.py:22-47, src/unet_models.py,
src/steps/pytorch/architectures/unet.py)."""

from mapping_tpu.models.registry import build_network, PRETRAINED_NETWORKS
from mapping_tpu.models.resnet import ResNetEncoder
from mapping_tpu.models.unet_resnet import UNetResNet, AlbuNet
from mapping_tpu.models.vgg import UNet11, UNetVGG16
from mapping_tpu.models.scratch import UNet, UNetMultitask

__all__ = [
    "build_network",
    "PRETRAINED_NETWORKS",
    "ResNetEncoder",
    "UNetResNet",
    "AlbuNet",
    "UNet11",
    "UNetVGG16",
    "UNet",
    "UNetMultitask",
]
