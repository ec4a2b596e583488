from .viz import tensor2array, depth_visualizer
from .meters import AverageMeter, ProgressLogger

__all__ = ["tensor2array", "depth_visualizer", "AverageMeter", "ProgressLogger"]
