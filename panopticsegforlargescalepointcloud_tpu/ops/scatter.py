"""Segment reductions (the TPU equivalents of torch-scatter).

The reference delegates voxel pooling, cluster max-pooling and per-instance
means to the C++/CUDA torch-scatter library
(``/root/reference/torch_points3d/core/data_transform/grid_transform.py:10``,
``models/panoptic/PointGroup3heads.py:419-438``,
``core/losses/panoptic_losses.py:260-276``). On TPU these are native XLA
scatter ops via ``jax.ops.segment_*`` - no custom kernel needed; XLA lowers
them to efficient sorted-segment reductions.

All wrappers are fixed-shape: ``num_segments`` is static and out-of-range /
negative segment ids are dropped (jax scatter semantics in non-checked mode).
Padding rows should carry segment id -1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, eps: float = 1e-8
) -> jnp.ndarray:
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    if data.ndim > 1:
        count = count.reshape(count.shape + (1,) * (data.ndim - 1))
    return total / (count + eps)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    fill: float | None = None,
) -> jnp.ndarray:
    """Segment max; empty segments get ``fill`` (default: dtype min)."""
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    if fill is not None:
        ones = jnp.ones(data.shape[:1], dtype=jnp.int32)
        count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
        empty = count == 0
        if data.ndim > 1:
            empty = empty.reshape(empty.shape + (1,) * (data.ndim - 1))
        out = jnp.where(empty, jnp.asarray(fill, dtype=data.dtype), out)
    return out


def segment_min(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    fill: float | None = None,
) -> jnp.ndarray:
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    if fill is not None:
        ones = jnp.ones(data.shape[:1], dtype=jnp.int32)
        count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
        empty = count == 0
        if data.ndim > 1:
            empty = empty.reshape(empty.shape + (1,) * (data.ndim - 1))
        out = jnp.where(empty, jnp.asarray(fill, dtype=data.dtype), out)
    return out
