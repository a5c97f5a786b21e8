from .timestamps import TimestampIndex, first_element_greater_than, last_element_less_than
from .augmentation import Compose, CenterCrop, RandomCrop, RandomRotationFlip
from .datasets import (
    VoxelGridDataset, RawEventsDataset, FrameDataset,
    SynchronizedFramesEventsDataset, SynchronizedFramesEventsRawDataset,
    SequenceSynchronizedFramesEventsDataset,
)
from .loader import (
    ConcatSequenceDataset, BatchLoader, concatenate_subfolders, device_prefetch,
)
from . import synthetic

__all__ = [
    "TimestampIndex", "first_element_greater_than", "last_element_less_than",
    "Compose", "CenterCrop", "RandomCrop", "RandomRotationFlip",
    "VoxelGridDataset", "RawEventsDataset", "FrameDataset",
    "SynchronizedFramesEventsDataset", "SynchronizedFramesEventsRawDataset",
    "SequenceSynchronizedFramesEventsDataset",
    "ConcatSequenceDataset", "BatchLoader", "concatenate_subfolders",
    "device_prefetch", "synthetic",
]
