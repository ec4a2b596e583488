from .datasets import SequenceSet, PairSet, ValidationSet
from .loader import BatchLoader
from . import transforms
from . import device_augment

__all__ = [
    "SequenceSet",
    "PairSet",
    "ValidationSet",
    "BatchLoader",
    "transforms",
    "device_augment",
]
