"""Flax network zoo (NHWC / NDHWC, TPU-native layouts).

Reference parity map:
  resnet.ResNet18Features/Encoder <- torchvision resnet18 (+ ImageEncoder)
  revresnet.RevResNet18           <- networks/revresnet.py
  uresnet.UResNet                 <- networks/uresnet.py Net/Net_inpaint
                                     + models/marrnet1.py minmax head
  voxel_nets.VoxelDecoder/Generator/Discriminator <- networks/networks.py
  unet3d.UNet3D                   <- networks.Unet_3D
"""

from .resnet import ResNet18Features, ResNet18Encoder
from .revresnet import RevResNet18, RevLayer, RevBasicBlock, Deconv
from .uresnet import UResNet, URDecoder, MinmaxHead
from .voxel_nets import VoxelDecoder, VoxelGenerator, VoxelDiscriminator
from .unet3d import UNet3D

__all__ = [
    "ResNet18Features", "ResNet18Encoder", "RevResNet18", "RevLayer",
    "RevBasicBlock", "Deconv", "UResNet", "URDecoder", "MinmaxHead",
    "VoxelDecoder", "VoxelGenerator", "VoxelDiscriminator", "UNet3D",
]
