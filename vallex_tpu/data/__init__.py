"""Training data pipeline: HDF5 dataset, bucketing sampler, TPU collation."""

from .dataset import (
    AudioDataset,
    DynamicBatchSampler,
    collate,
    create_dataloader,
)

__all__ = [
    "AudioDataset",
    "DynamicBatchSampler",
    "collate",
    "create_dataloader",
]
