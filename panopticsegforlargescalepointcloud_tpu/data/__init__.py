"""Data layer: PLY io, voxelization, sampling, transforms, batching."""

from .batch import VoxelBatch, collate_tiles, stack_device_batches  # noqa: F401
from .synthetic import synthetic_tile  # noqa: F401
from .ply import read_ply, write_ply  # noqa: F401
from .voxelize import grid_sample  # noqa: F401
from .labels import set_extra_labels  # noqa: F401
from .datasets import (  # noqa: F401
    NPM3D_SPEC,
    TREEINS_SPEC,
    PanopticFileDataset,
    read_npm3d_format,
    read_treeins_format,
)
