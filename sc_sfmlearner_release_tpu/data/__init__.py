from .datasets import SequenceSet, PairSet, ValidationSet
from .loader import BatchLoader
from .packed import PackedSequenceSet, pack_dataset
from . import transforms
from . import device_augment

__all__ = [
    "SequenceSet",
    "PairSet",
    "ValidationSet",
    "PackedSequenceSet",
    "pack_dataset",
    "BatchLoader",
    "transforms",
    "device_augment",
]
