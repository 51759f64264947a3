"""Batched fixed-K radius neighbor search via grid-cell hashing.

TPU-native replacement for the C++ ball-query / KDTree radius machinery the
reference leans on (torch-points-kernels ``ball_query`` and the sklearn KDTree
queries at ``core/spatial_ops/neighbour_finder.py:35-37`` and
``core/data_transform/transforms.py:336-440``).

Strategy: bin points into cubic cells of side ``radius`` using the same
packed-key + sort machinery as the sparse grids; every point scans the 27
adjacent cells, up to ``cell_cap`` points per cell (CSR-style: cell start
found by binary search in the sorted cell keys). Candidates within the radius
are compacted to the K nearest with ``top_k``. All shapes static.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hashing import BitLayout, INVALID_KEY, pack_coords

_CELL_OFFSETS = np.stack(
    np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), axis=-1
).reshape(-1, 3).astype(np.int32)


def radius_neighbors(
    pos: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    k: int = 32,
    cell_cap: int = 16,
    bits: BitLayout = BitLayout(10, 10, 10),
    include_self: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest neighbors within ``radius`` (same batch sample only).

    Args:
      pos: [N, 3] float positions (padding rows arbitrary).
      batch: [N] int32 sample ids.
      valid: [N] bool.
      radius: search radius.
      k: static neighbor budget per point.
      cell_cap: static scan budget per cell (points beyond it in a cell are
        invisible as *candidates*, but can still find their own neighbors).

    Returns:
      (nbr_idx [N, k] int32 with -1 padding, nbr_dist2 [N, k] f32)
    """
    n = pos.shape[0]
    inv_r = 1.0 / radius
    cell = jnp.floor(pos * inv_r).astype(jnp.int32)
    keys = pack_coords(batch, cell, bits, extra_invalid=jnp.logical_not(valid))
    order = jnp.argsort(keys)
    skeys = keys[order]

    # candidate slots: for each of 27 cells, cell_cap consecutive sorted rows
    offs = jnp.asarray(_CELL_OFFSETS)
    q_cells = cell[:, None, :] + offs[None, :, :]  # [N, 27, 3]
    q_batch = jnp.broadcast_to(batch[:, None], (n, 27))
    inv_mask = jnp.broadcast_to(jnp.logical_not(valid)[:, None], (n, 27))
    q_keys = pack_coords(
        q_batch.reshape(-1), q_cells.reshape(-1, 3), bits,
        extra_invalid=inv_mask.reshape(-1),
    ).reshape(n, 27)
    start = jnp.searchsorted(skeys, q_keys, side="left").astype(jnp.int32)  # [N, 27]

    slot = jnp.arange(cell_cap, dtype=jnp.int32)
    cand_sorted_pos = start[:, :, None] + slot[None, None, :]  # [N, 27, cap]
    cand_sorted_pos = jnp.minimum(cand_sorted_pos, n - 1)
    in_cell = jnp.take(skeys, cand_sorted_pos) == q_keys[:, :, None]
    cand_idx = jnp.take(order, cand_sorted_pos)  # [N, 27, cap] original rows

    d = pos[:, None, None, :] - jnp.take(pos, cand_idx, axis=0)
    dist2 = jnp.sum(d * d, axis=-1)  # [N, 27, cap]
    ok = in_cell & (dist2 <= radius * radius) & (q_keys[:, :, None] != INVALID_KEY)
    if not include_self:
        ok = ok & (cand_idx != jnp.arange(n, dtype=jnp.int32)[:, None, None])

    m = 27 * cell_cap
    dist2 = jnp.where(ok, dist2, jnp.inf).reshape(n, m)
    cand_idx = jnp.where(ok, cand_idx, -1).reshape(n, m)
    kk = min(k, m)
    neg, sel = jax.lax.top_k(-dist2, kk)  # nearest first
    nbr_idx = jnp.take_along_axis(cand_idx, sel, axis=1)
    nbr_dist2 = -neg
    nbr_idx = jnp.where(jnp.isfinite(nbr_dist2), nbr_idx, -1)
    if kk < k:
        pad = k - kk
        nbr_idx = jnp.concatenate(
            [nbr_idx, jnp.full((n, pad), -1, jnp.int32)], axis=1
        )
        nbr_dist2 = jnp.concatenate(
            [nbr_dist2, jnp.full((n, pad), jnp.inf, nbr_dist2.dtype)], axis=1
        )
    return nbr_idx, nbr_dist2
