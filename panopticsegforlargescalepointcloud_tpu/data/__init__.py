"""Data layer: PLY io, voxelization, sampling, transforms, batching."""

from .batch import VoxelBatch, collate_tiles, stack_device_batches  # noqa: F401
from .synthetic import synthetic_tile  # noqa: F401
