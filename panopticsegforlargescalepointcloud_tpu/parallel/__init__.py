"""Multi-device execution: mesh setup and data-parallel train steps."""

from .mesh import (  # noqa: F401
    make_mesh,
    make_parallel_eval_forward,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
