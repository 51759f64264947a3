"""Multi-device execution: mesh setup and data-parallel train steps."""

from .mesh import make_mesh, make_parallel_train_step, replicate, shard_batch  # noqa: F401
