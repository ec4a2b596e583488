from .viz import tensor2array, depth_visualizer
from .meters import AverageMeter, ProgressLogger
from .profiling import trace, StepTimer, enable_nan_debugging

__all__ = [
    "tensor2array",
    "depth_visualizer",
    "AverageMeter",
    "ProgressLogger",
    "trace",
    "StepTimer",
    "enable_nan_debugging",
]
