"""Region growing as fixed-shape connected components on TPU.

Behavioral equivalent of torch-points-kernels' C++ ``region_grow`` (BFS ball
growing per semantic class, used at
``/root/reference/torch_points3d/models/panoptic/PointGroup3heads.py:166-210``
with radius = 1.5*grid_size, nsample=200, min_cluster_size=10): clusters are
the connected components of the radius graph restricted to points sharing the
same predicted (non-stuff) semantic class within the same sample.

TPU formulation: build a *symmetrized* radius-graph adjacency once
(:func:`..cluster.neighbors.radius_graph`: half-stencil candidate scan + one
reverse-edge co-sort), folding ``batch * C + class`` into the cell key so the
same-class/same-sample constraint is free, then iterate pull-only min-label
propagation with pointer jumping inside a ``lax.while_loop`` until fixpoint
(~9 iterations on real tiles; no per-iteration scatters - the v5e profile
showed scatter pushes dominating the loop). Finally compact representative
labels to dense proposal ids and drop components smaller than
``min_cluster_size``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.hashing import BitLayout
from ..ops.scatter import segment_sum
from .neighbors import DEFAULT_CELL_BITS, cell_seed_labels, radius_graph


class RegionGrowResult(NamedTuple):
    point_prop: jnp.ndarray  # [N] int32 proposal id, -1 = none
    prop_valid: jnp.ndarray  # [P] bool
    prop_batch: jnp.ndarray  # [P] int32 (-1 pad)
    num_props: jnp.ndarray  # [] int32 (pre-capacity-clip count)
    # eligible (grow_mask) rows left out of clustering by the point_cap
    # compaction budget; 0 when point_cap is off or covers all thing rows
    overflow: jnp.ndarray
    # radius-graph degradation count (reverse-slot truncation + cell-key
    # overflow, neighbors.radius_graph) - nonzero means possible under-merge
    graph_trunc: jnp.ndarray


def _fold_bits(num_ids: int) -> BitLayout:
    """Cell-key layout giving the id field enough bits for ``num_ids`` folded
    (batch*C + class) values, splitting the rest across x/y/z (x widest)."""
    bb = 1
    while (1 << bb) - 1 <= num_ids:
        bb += 1
    rem = 32 - bb
    bz = rem // 3
    by = (rem - bz) // 2
    bx = rem - bz - by
    return BitLayout(bx, by, bz)


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

    When the caller statically knows ``num_classes``/``num_samples`` (model
    configs do), prefer :func:`region_grow_folded` - it folds the class into
    the cell key, wasting no candidate slots on cross-class points.

    Returns:
      RegionGrowResult with per-point proposal ids in [0, P).
    """
    fwd, rev, trunc = radius_graph(
        pos, batch, grow_mask, radius, k=k_neighbors, cell_cap=cell_cap,
        bits=DEFAULT_CELL_BITS,
    )
    # post-hoc same-class filter on both edge directions
    def filt(e):
        safe = jnp.maximum(e, 0)
        ok = (e >= 0) & (jnp.take(sem_class, safe) == sem_class[:, None])
        return jnp.where(ok, e, -1)

    # no cell seeding here: seeds must separate classes, and without a static
    # class count there is no safe id fold - the folded variant seeds
    r = _grow_on_edges(
        filt(fwd), filt(rev), batch, grow_mask, max_proposals,
        min_cluster_size, max_iters,
    )
    return r._replace(graph_trunc=trunc)


def region_grow_folded(
    pos: jnp.ndarray,
    sem_class: jnp.ndarray,
    batch: jnp.ndarray,
    grow_mask: jnp.ndarray,
    radius: float,
    max_proposals: int,
    num_classes: int,
    num_samples: int,
    min_cluster_size: int = 10,
    k_neighbors: int = 32,
    cell_cap: int = 16,
    max_iters: int = 64,
    point_cap: int = 0,
    dense_pull: bool = False,
) -> RegionGrowResult:
    """:func:`region_grow` with the class folded into the cell key (static
    ``num_classes`` / ``num_samples`` known from the model config): candidate
    slots only ever hold same-sample same-class points, so no edge budget is
    wasted and no post-filter pass is needed.

    ``dense_pull`` (TPU, requires ``point_cap``): propagate over the EXACT
    radius graph with the all-pairs MXU formulation
    (:mod:`.dense_grow`) instead of building edge lists - no k/cell_cap
    truncation, no candidate gathers/sorts. Falls back to the edge path
    when the compacted shape does not tile (``dense_grow.supports_dense``).

    ``point_cap`` > 0 compacts the eligible (grow_mask) rows into a [T] row
    set before the radius graph and propagation run, so every per-row cost
    (candidate scan, [T, k] label gathers in the loop) scales with the thing
    count instead of the full padded row count - the reference pays nothing
    here because its C++ BFS walks thing points only
    (``/root/reference/torch_points3d/models/panoptic/PointGroup3heads.py:185-210``).
    Thing rows beyond the cap are excluded and counted in ``overflow``
    (surfaced as ``cluster_overflow`` in train/eval metrics)."""
    n = pos.shape[0]
    num_ids = num_samples * num_classes  # static fold bound (ADVICE r3:
    # per-id cell shifts need the scatter table sized to the folded id range)
    bits = _fold_bits(num_ids)

    if point_cap and point_cap < n:
        t = point_cap
        # stable compaction: thing rows keep their relative (key-sorted) order
        cnt = jnp.cumsum(grow_mask.astype(jnp.int32)) - 1
        tgt = jnp.where(grow_mask & (cnt < t), cnt, t)
        rows = jnp.full((t + 1,), n, jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )[:t]
        rvalid = rows < n
        rows_safe = jnp.minimum(rows, n - 1)
        total = jnp.sum(grow_mask.astype(jnp.int32))
        overflow = jnp.maximum(total - t, 0)
        cpos = jnp.take(pos, rows_safe, axis=0)
        cbatch = jnp.take(batch, rows_safe)
        cids = cbatch * jnp.int32(num_classes) + jnp.take(sem_class, rows_safe)
        from .dense_grow import dense_components, supports_dense

        if dense_pull and supports_dense(t):
            # invalid rows carry junk cids (clamped gathers) - excluded by
            # their +inf norms inside dense_components, not by id
            init = cell_seed_labels(cpos, cids, rvalid, radius, bits,
                                    num_ids=num_ids)
            labels = dense_components(
                cpos, cids, rvalid, radius, init, max_iters
            )
            r = _finalize_components(
                labels, cbatch, rvalid, max_proposals, min_cluster_size
            )
            trunc = jnp.zeros((), jnp.int32)  # exact graph: nothing truncated
        else:
            fwd, rev, trunc = radius_graph(
                cpos, cids, rvalid, radius, k=k_neighbors, cell_cap=cell_cap,
                bits=bits, num_ids=num_ids,
            )
            init = cell_seed_labels(cpos, cids, rvalid, radius, bits,
                                    num_ids=num_ids)
            r = _grow_on_edges(
                fwd, rev, cbatch, rvalid, max_proposals, min_cluster_size,
                max_iters, init_labels=init,
            )
        point_prop = jnp.full((n + 1,), -1, jnp.int32).at[
            jnp.where(rvalid, rows_safe, n)
        ].set(r.point_prop, mode="drop")[:n]
        return RegionGrowResult(
            point_prop, r.prop_valid, r.prop_batch, r.num_props, overflow,
            trunc,
        )

    ids = batch * jnp.int32(num_classes) + sem_class
    fwd, rev, trunc = radius_graph(
        pos, ids, grow_mask, radius, k=k_neighbors, cell_cap=cell_cap,
        bits=bits, num_ids=num_ids,
    )
    init = cell_seed_labels(pos, ids, grow_mask, radius, bits, num_ids=num_ids)
    r = _grow_on_edges(
        fwd, rev, batch, grow_mask, max_proposals, min_cluster_size, max_iters,
        init_labels=init,
    )
    return r._replace(graph_trunc=trunc)


def _grow_on_edges(
    fwd: jnp.ndarray,
    rev: jnp.ndarray,
    batch: jnp.ndarray,
    grow_mask: jnp.ndarray,
    max_proposals: int,
    min_cluster_size: int,
    max_iters: int,
    init_labels: jnp.ndarray | None = None,
) -> RegionGrowResult:
    """Connected components by pull-only min-label propagation over a
    symmetrized adjacency, then size filtering + dense id compaction.

    ``init_labels``: optional pre-merged seeds (cell_seed_labels) - must map
    each valid row to a member row id of its (sub)component, with every used
    representative labeled by itself; singleton self-labels otherwise."""
    n = fwd.shape[0]
    adj = jnp.concatenate([fwd, rev], axis=1)  # [N, kf+kr]
    safe_adj = jnp.maximum(adj, 0)
    if init_labels is None:
        init_labels = jnp.where(grow_mask, jnp.arange(n, dtype=jnp.int32), n)

    def pull(labels):
        nbr_labels = jnp.where(adj >= 0, jnp.take(labels, safe_adj), n)
        new = jnp.minimum(labels, jnp.min(nbr_labels, axis=1))
        # pointer jumps (path compression: label <- label of label); [N]
        # gathers are ~32x cheaper than the adjacency pull, and each jump
        # shortens chains geometrically
        for _ in range(3):
            new = jnp.minimum(
                new, jnp.take(jnp.append(new, n), jnp.minimum(new, n))
            )
        return jnp.where(grow_mask, new, n)

    def body(state):
        labels, _, it = state
        # two pulls per while iteration: the loop-carry/convergence-check
        # overhead is a large fraction of one pull's cost on v5e
        new = pull(pull(labels))
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init_labels, jnp.bool_(True), jnp.int32(0))
    )
    return _finalize_components(
        labels, batch, grow_mask, max_proposals, min_cluster_size
    )


def _finalize_components(
    labels: jnp.ndarray,
    batch: jnp.ndarray,
    grow_mask: jnp.ndarray,
    max_proposals: int,
    min_cluster_size: int,
) -> RegionGrowResult:
    """Converged min-member-row labels -> size filter + dense proposal ids
    (shared by the edge and dense-pull propagation paths)."""
    n = labels.shape[0]
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
    return RegionGrowResult(
        point_prop, prop_valid, prop_batch, num, jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
