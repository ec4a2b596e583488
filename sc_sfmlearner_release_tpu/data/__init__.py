from .datasets import SequenceSet, PairSet, ValidationSet
from .loader import BatchLoader
from . import transforms

__all__ = ["SequenceSet", "PairSet", "ValidationSet", "BatchLoader", "transforms"]
