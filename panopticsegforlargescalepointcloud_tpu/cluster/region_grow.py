"""Region growing as fixed-shape connected components on TPU.

Behavioral equivalent of torch-points-kernels' C++ ``region_grow`` (BFS ball
growing per semantic class, used at
``/root/reference/torch_points3d/models/panoptic/PointGroup3heads.py:166-210``
with radius = 1.5*grid_size, nsample=200, min_cluster_size=10): clusters are
the connected components of the radius graph restricted to points sharing the
same predicted (non-stuff) semantic class within the same sample.

TPU formulation: build a K-capped radius neighbor list once, then iterate
min-label propagation (pull from neighbors + push via scatter-min to
symmetrize capped edges + one pointer-jump for path compression) inside a
``lax.while_loop`` until fixpoint. Components converge in O(log diameter)
iterations with the pointer jump. Finally compact representative labels to
dense proposal ids and drop components smaller than ``min_cluster_size``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.scatter import segment_sum
from .neighbors import radius_neighbors


class RegionGrowResult(NamedTuple):
    point_prop: jnp.ndarray  # [N] int32 proposal id, -1 = none
    prop_valid: jnp.ndarray  # [P] bool
    prop_batch: jnp.ndarray  # [P] int32 (-1 pad)
    num_props: jnp.ndarray  # [] int32 (pre-capacity-clip count)


def region_grow(
    pos: jnp.ndarray,
    sem_class: jnp.ndarray,
    batch: jnp.ndarray,
    grow_mask: jnp.ndarray,
    radius: float,
    max_proposals: int,
    min_cluster_size: int = 10,
    k_neighbors: int = 32,
    cell_cap: int = 16,
    max_iters: int = 64,
) -> RegionGrowResult:
    """Cluster same-class points by radius connectivity.

    Args:
      pos: [N, 3] positions (raw or offset-shifted).
      sem_class: [N] int32 predicted class per point.
      batch: [N] int32 sample id.
      grow_mask: [N] bool - True for points eligible to cluster (valid, thing
        class). Stuff/ignored points are excluded by the caller, mirroring
        ``ignore_labels`` of the reference call sites.
      radius: connectivity radius (reference: 1.5 * grid_size).
      max_proposals: static proposal budget P.
      min_cluster_size: drop smaller components (reference: 10).
      k_neighbors / cell_cap: neighbor-search budgets.
      max_iters: propagation bound (fixpoint usually earlier).

    Returns:
      RegionGrowResult with per-point proposal ids in [0, P).
    """
    n = pos.shape[0]
    nbr_idx, _ = radius_neighbors(
        pos, batch, grow_mask, radius, k=k_neighbors, cell_cap=cell_cap
    )
    # Keep only same-class edges between eligible points.
    safe = jnp.maximum(nbr_idx, 0)
    same_class = jnp.take(sem_class, safe) == sem_class[:, None]
    nbr_ok = (nbr_idx >= 0) & same_class & jnp.take(grow_mask, safe)
    nbr_ok = nbr_ok & grow_mask[:, None]
    nbr = jnp.where(nbr_ok, nbr_idx, -1)

    init_labels = jnp.where(grow_mask, jnp.arange(n, dtype=jnp.int32), n)

    def body(state):
        labels, _, it = state
        safe_nbr = jnp.maximum(nbr, 0)
        nbr_labels = jnp.where(nbr >= 0, jnp.take(labels, safe_nbr), n)
        pulled = jnp.minimum(labels, jnp.min(nbr_labels, axis=1))
        # push: scatter my (pulled) label into my neighbors to cover edges the
        # K/cell caps made one-directional
        pushed = jnp.full((n + 1,), n, dtype=jnp.int32)
        idx = jnp.where(nbr >= 0, nbr, n)
        pushed = pushed.at[idx.reshape(-1)].min(
            jnp.broadcast_to(pulled[:, None], nbr.shape).reshape(-1)
        )
        new = jnp.minimum(pulled, pushed[:n])
        # pointer jump (path compression)
        new = jnp.minimum(new, jnp.take(jnp.append(new, n), jnp.minimum(new, n)))
        new = jnp.where(grow_mask, new, n)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init_labels, jnp.bool_(True), jnp.int32(0))
    )

    # component sizes; drop small ones
    sizes = segment_sum(
        grow_mask.astype(jnp.int32), jnp.where(grow_mask, labels, -1), n
    )
    big = jnp.take(sizes, jnp.minimum(labels, n - 1)) >= min_cluster_size
    keep = grow_mask & big

    # compact representative labels -> dense proposal ids (roots only)
    is_root = keep & (labels == jnp.arange(n, dtype=jnp.int32))
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # root order
    root_prop = jnp.where(is_root & (rank < max_proposals), rank, -1)  # [N]
    point_prop = jnp.where(
        keep, jnp.take(jnp.append(root_prop, -1), jnp.minimum(labels, n)), -1
    )
    num = jnp.sum(is_root.astype(jnp.int32))
    prop_ids = jnp.arange(max_proposals, dtype=jnp.int32)
    prop_valid = prop_ids < jnp.minimum(num, max_proposals)
    # batch of each proposal = batch of its root
    root_rows = jnp.full((max_proposals,), -1, jnp.int32)
    root_rows = root_rows.at[jnp.where(root_prop >= 0, root_prop, max_proposals)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    prop_batch = jnp.where(
        prop_valid, jnp.take(batch, jnp.maximum(root_rows, 0)), -1
    )
    return RegionGrowResult(point_prop, prop_valid, prop_batch, num)
