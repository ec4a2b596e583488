from .resnet import ResNetEncoder, encoder_channels
from .disp_net import DispNet, DepthDecoder
from .pose_net import PoseNet, PoseDecoder
from . import convert

__all__ = [
    "ResNetEncoder",
    "encoder_channels",
    "DispNet",
    "DepthDecoder",
    "PoseNet",
    "PoseDecoder",
    "convert",
]
