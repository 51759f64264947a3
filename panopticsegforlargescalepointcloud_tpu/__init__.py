"""TPU-native panoptic segmentation framework for large-scale LiDAR point clouds.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
prs-eth/PanopticSegForLargeScalePointCloud (torch-points3d fork for
"Towards Accurate Instance Segmentation in Large-scale LiDAR Point Clouds",
ISPRS Annals 2023): sparse 3D UNet panoptic segmentation with on-device
clustering, proposal scoring, and full-scene block merging.

Subpackages
-----------
ops       -- sparse voxel core: coordinate hashing, kernel maps, sparse conv
models    -- flax modules: sparse UNet backbone, heads, PointGroup3heads
data      -- PLY io, voxelization, cylinder sampling, transforms, batching
cluster   -- on-device region-grow, mean-shift, density grouping, NMS
eval      -- metrics (PQ/F1/mIoU), vote accumulation, block merging, trackers
train     -- trainer, optimizers/schedulers, checkpointing
parallel  -- jax.sharding mesh setup and sharded train steps
config    -- YAML config composition (hydra-like defaults list + interpolation)
"""

__version__ = "0.1.0"
