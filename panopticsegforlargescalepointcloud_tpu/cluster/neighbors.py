"""Batched fixed-K radius neighbor search via grid-cell hashing.

TPU-native replacement for the C++ ball-query / KDTree radius machinery the
reference leans on (torch-points-kernels ``ball_query`` and the sklearn KDTree
queries at ``core/spatial_ops/neighbour_finder.py:35-37`` and
``core/data_transform/transforms.py:336-440``).

Strategy: bin points into cubic cells of side ``radius`` using the same
packed-key + sort machinery as the sparse grids; every point scans the 27
adjacent cells, up to ``cell_cap`` points per cell (CSR-style: cell starts
found by a single co-sort, see :func:`run_starts` - per-query binary search
profiled ~6x slower on v5e, cf. ``ops/hashing.lookup``). Candidates within
the radius are compacted to the K nearest with ``top_k``. All shapes static.

Cells are shifted by the *per-id* minimum before packing (for cross-set
queries, the minimum over query ∪ support of the id), so each sample only
needs its own extent to fit the bit budget (~92 m at r=0.18 with the default
9-bit axes) — samples in one batch may keep distant absolute frames (e.g.
un-centered far-apart tiles) without their packed keys overflowing. Callers
whose ids exceed the default ``num_ids`` table (folded ids like
``batch * C + class``) must pass their static id bound, or ids past the
table collapse to one shared shift (ADVICE r3).
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

# The 13 offsets lexicographically greater than (0,0,0): each undirected
# adjacent-cell pair is visited from exactly one side (the other direction is
# recovered by the reverse-edge pass in radius_graph).
_HALF_OFFSETS = np.array(
    [o for o in _CELL_OFFSETS.tolist() if tuple(o) > (0, 0, 0)], np.int32
)

# Default cell-key layout: 9 bits per axis (512-cell extents) leaves 5 bits =
# 31 distinct batch/fold ids. The old (10,10,10) default left only TWO batch
# bits, silently dropping sample ids >= 3 from clustering in 4-tile batches.
DEFAULT_CELL_BITS = BitLayout(9, 9, 9)


def run_starts(sorted_keys: jnp.ndarray, query_keys: jnp.ndarray) -> jnp.ndarray:
    """``searchsorted(sorted_keys, q, side="left")`` via one co-sort.

    Queries are concatenated *before* the table so a stable argsort places
    each query ahead of equal-keyed table rows; a suffix-min over table row
    tags then yields, for every query, the first table index with
    ``key >= q``. One XLA sort instead of per-query binary-search gathers
    (the same trade as ``ops/hashing.lookup``; scans profiled ~6x slower).

    Returns int32 of query_keys' shape; ``len(sorted_keys)`` when no table
    key is >= the query.
    """
    n = sorted_keys.shape[0]
    shape = query_keys.shape
    q = query_keys.reshape(-1)
    m = q.shape[0]
    all_keys = jnp.concatenate([q, sorted_keys])
    tag = jnp.concatenate(
        [jnp.full((m,), -1, jnp.int32), jnp.arange(n, dtype=jnp.int32)]
    )
    order = jnp.argsort(all_keys, stable=True)
    stags = tag[order]
    table_pos = jnp.where(stags >= 0, stags, n)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(table_pos)))
    res = jnp.zeros((m + n,), jnp.int32).at[order].set(nxt)
    return res[:m].reshape(shape)


# Default scatter-table size for per-id cell minima; covers plain sample ids
# (train batches of ~4, a handful of eval tiles per device). Callers passing
# FOLDED ids (e.g. batch * num_classes + class, region_grow_folded) MUST size
# ``num_ids`` from their static fold bound - ids >= the table size collapse
# into the last slot and silently fall back to a shared (union-extent) shift
# for those rows (ADVICE r3).
_MAX_SAMPLES = 256


def _shifted_cells(pos, batch, valid, radius, bits: BitLayout,
                   num_ids: int = _MAX_SAMPLES):
    """Cell coords shifted so each id's (valid) minimum packs to 0, using
    the full 2^b unsigned range per axis.

    Per-id (not global-batch) shifting means a batch whose samples sit in
    distant absolute frames still packs every sample into the bit budget; only
    the per-id *extent* must fit 2^bits cells. ``num_ids``: static bound on
    ``batch`` values (exact per-id shifts need every id < num_ids).
    """
    cell = jnp.floor(pos * (1.0 / radius)).astype(jnp.int32)
    big = jnp.int32(1 << 24)
    cellw = jnp.where(valid[:, None], cell, big)
    b = jnp.clip(batch, 0, num_ids - 1)
    cmin = jnp.full((num_ids, 3), big, jnp.int32).at[b].min(cellw)
    half = jnp.array(
        [1 << (bits.bx - 1), 1 << (bits.by - 1), 1 << (bits.bz - 1)], jnp.int32
    )
    return cell - cmin[b] - half


def radius_neighbors(
    pos: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    k: int = 32,
    cell_cap: int = 16,
    bits: BitLayout = DEFAULT_CELL_BITS,
    include_self: bool = True,
    num_ids: int = _MAX_SAMPLES,
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
      num_ids: static bound on ``batch`` values (exact per-sample cell shifts
        need every id < num_ids; callers passing folded ids must size this).

    Returns:
      (nbr_idx [N, k] int32 with -1 padding, nbr_dist2 [N, k] f32)
    """
    n = pos.shape[0]
    cell = _shifted_cells(pos, batch, valid, radius, bits, num_ids)
    keys = pack_coords(batch, cell, bits, extra_invalid=jnp.logical_not(valid))
    order = jnp.argsort(keys)
    skeys = keys[order]
    pos_s = jnp.take(pos, order, axis=0)  # gather once; candidates index pos_s

    offs = jnp.asarray(_CELL_OFFSETS)
    q_cells = cell[:, None, :] + offs[None, :, :]  # [N, 27, 3]
    q_batch = jnp.broadcast_to(batch[:, None], (n, 27))
    inv_mask = jnp.broadcast_to(jnp.logical_not(valid)[:, None], (n, 27))
    q_keys = pack_coords(
        q_batch.reshape(-1), q_cells.reshape(-1, 3), bits,
        extra_invalid=inv_mask.reshape(-1),
    ).reshape(n, 27)
    start = run_starts(skeys, q_keys)  # [N, 27]

    slot = jnp.arange(cell_cap, dtype=jnp.int32)
    cand_sorted_pos = start[:, :, None] + slot[None, None, :]  # [N, 27, cap]
    cand_sorted_pos = jnp.minimum(cand_sorted_pos, n - 1)
    in_cell = jnp.take(skeys, cand_sorted_pos) == q_keys[:, :, None]

    d = pos[:, None, None, :] - jnp.take(pos_s, cand_sorted_pos, axis=0)
    dist2 = jnp.sum(d * d, axis=-1)  # [N, 27, cap]
    ok = in_cell & (dist2 <= radius * radius) & (q_keys[:, :, None] != INVALID_KEY)

    m = 27 * cell_cap
    dist2 = jnp.where(ok, dist2, jnp.inf).reshape(n, m)
    cand_sorted = jnp.where(ok, cand_sorted_pos, 0).reshape(n, m)
    kk = min(k, m)
    neg, sel = jax.lax.top_k(-dist2, kk)  # nearest first
    sel_sorted = jnp.take_along_axis(cand_sorted, sel, axis=1)
    nbr_idx = jnp.take(order, sel_sorted)  # map back to original rows ([N, kk])
    nbr_dist2 = -neg
    nbr_idx = jnp.where(jnp.isfinite(nbr_dist2), nbr_idx, -1)
    if not include_self:
        self_hit = nbr_idx == jnp.arange(n, dtype=jnp.int32)[:, None]
        nbr_idx = jnp.where(self_hit, -1, nbr_idx)
        nbr_dist2 = jnp.where(self_hit, jnp.inf, nbr_dist2)
    if kk < k:
        pad = k - kk
        nbr_idx = jnp.concatenate(
            [nbr_idx, jnp.full((n, pad), -1, jnp.int32)], axis=1
        )
        nbr_dist2 = jnp.concatenate(
            [nbr_dist2, jnp.full((n, pad), jnp.inf, nbr_dist2.dtype)], axis=1
        )
    return nbr_idx, nbr_dist2


def radius_query(
    q_pos: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_valid: jnp.ndarray,
    s_pos: jnp.ndarray,
    s_ids: jnp.ndarray,
    s_valid: jnp.ndarray,
    radius: float,
    k: int = 16,
    cell_cap: int = 16,
    bits: BitLayout = DEFAULT_CELL_BITS,
    num_ids: int = _MAX_SAMPLES,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-set fixed-K radius search: for each query row, up to ``k``
    nearest *support* rows within ``radius`` (same id only).

    The cross-set analog of :func:`radius_neighbors` (reference
    ``RadiusNeighbourFinder(x, y, batch_x, batch_y)`` semantics,
    ``core/spatial_ops/neighbour_finder.py:35-37``, consumed by the KPConv
    strided blocks at ``modules/KPConv/blocks.py:84`` and PointNet++ set
    abstraction): support rows are binned into cells of side ``radius``;
    every query scans its 27 adjacent cells up to ``cell_cap`` support rows
    per cell. The cell shift is per id over the UNION of both sets (query
    and support of one sample must share a packing frame, but distinct
    samples may keep distant absolute frames - ADVICE r3).

    Returns (idx [Q, k] int32 into support rows, -1 padding; dist2 [Q, k]
    f32, +inf padding), nearest first.
    """
    nq, ns = q_pos.shape[0], s_pos.shape[0]
    inv = jnp.float32(1.0 / radius)
    q_cell = jnp.floor(q_pos * inv).astype(jnp.int32)
    s_cell = jnp.floor(s_pos * inv).astype(jnp.int32)
    big = jnp.int32(1 << 24)
    # per-id minimum over query ∪ support (one shared frame per sample)
    qi = jnp.clip(q_ids, 0, num_ids - 1)
    si = jnp.clip(s_ids, 0, num_ids - 1)
    cmin = jnp.full((num_ids, 3), big, jnp.int32)
    cmin = cmin.at[qi].min(jnp.where(q_valid[:, None], q_cell, big))
    cmin = cmin.at[si].min(jnp.where(s_valid[:, None], s_cell, big))
    half = jnp.array(
        [1 << (bits.bx - 1), 1 << (bits.by - 1), 1 << (bits.bz - 1)], jnp.int32
    )
    q_cell = q_cell - cmin[qi] - half
    s_cell = s_cell - cmin[si] - half

    s_keys = pack_coords(s_ids, s_cell, bits, extra_invalid=jnp.logical_not(s_valid))
    order = jnp.argsort(s_keys)
    skeys = s_keys[order]
    pos_s = jnp.take(s_pos, order, axis=0)

    offs = jnp.asarray(_CELL_OFFSETS)
    qc = q_cell[:, None, :] + offs[None, :, :]  # [Q, 27, 3]
    qb = jnp.broadcast_to(q_ids[:, None], (nq, 27))
    inv_mask = jnp.broadcast_to(jnp.logical_not(q_valid)[:, None], (nq, 27))
    q_keys = pack_coords(
        qb.reshape(-1), qc.reshape(-1, 3), bits,
        extra_invalid=inv_mask.reshape(-1),
    ).reshape(nq, 27)
    start = run_starts(skeys, q_keys)  # [Q, 27]

    slot = jnp.arange(cell_cap, dtype=jnp.int32)
    cand = jnp.minimum(start[:, :, None] + slot[None, None, :], ns - 1)
    in_cell = jnp.take(skeys, cand) == q_keys[:, :, None]
    d = q_pos[:, None, None, :] - jnp.take(pos_s, cand, axis=0)
    dist2 = jnp.sum(d * d, axis=-1)
    ok = in_cell & (dist2 <= radius * radius) & (q_keys[:, :, None] != INVALID_KEY)

    m = 27 * cell_cap
    dist2 = jnp.where(ok, dist2, jnp.inf).reshape(nq, m)
    candf = jnp.where(ok, cand, 0).reshape(nq, m)
    kk = min(k, m)
    neg, sel = jax.lax.top_k(-dist2, kk)
    sel_sorted = jnp.take_along_axis(candf, sel, axis=1)
    idx = jnp.take(order, sel_sorted)
    dist2 = -neg
    idx = jnp.where(jnp.isfinite(dist2), idx, -1)
    if kk < k:
        pad = k - kk
        idx = jnp.concatenate([idx, jnp.full((nq, pad), -1, jnp.int32)], axis=1)
        dist2 = jnp.concatenate(
            [dist2, jnp.full((nq, pad), jnp.inf, dist2.dtype)], axis=1
        )
    return idx, dist2


def cell_seed_labels(
    pos: jnp.ndarray,
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    bits: BitLayout,
    num_ids: int = _MAX_SAMPLES,
) -> jnp.ndarray:
    """Initial union-find labels that pre-merge provably-connected points.

    Any two same-id points in one cubic cell of side ``radius/2`` are at most
    ``radius*sqrt(3)/2 < radius`` apart, hence in the same component; give
    each such cell's points the row id of one representative member so
    propagation starts from the cell quotient graph instead of singletons
    (fewer iterations; exactness unaffected - only provably-connected rows
    are merged). Points whose half-cell coordinate overflows ``bits`` just
    stay self-seeded (safe fallback).

    Returns [N] int32 labels (row id of the representative; ``n`` for
    invalid rows).
    """
    n = pos.shape[0]
    half_r = radius * 0.5
    cell = _shifted_cells(pos, ids, valid, half_r, bits, num_ids)
    keys = pack_coords(ids, cell, bits, extra_invalid=jnp.logical_not(valid))
    order = jnp.argsort(keys)
    skeys = keys[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    )
    head_pos = jax.lax.cummax(
        jnp.where(first, jnp.arange(n, dtype=jnp.int32), -1)
    )
    rep_sorted = jnp.take(order, jnp.maximum(head_pos, 0))
    # rows whose half-cell key overflowed the bit budget stay self-seeded
    lab_sorted = jnp.where(skeys != INVALID_KEY, rep_sorted, order)
    labels = jnp.full((n,), n, jnp.int32).at[order].set(lab_sorted)
    return jnp.where(valid, labels, n)


def radius_graph(
    pos: jnp.ndarray,
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    k: int = 32,
    cell_cap: int = 16,
    bits: BitLayout = DEFAULT_CELL_BITS,
    with_reverse: bool = True,
    num_ids: int = _MAX_SAMPLES,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetrized radius-graph adjacency for connectivity (region growing).

    Cheaper than :func:`radius_neighbors` by construction:

    * **half stencil** - each undirected pair is found once, from the
      lexicographically-lower cell (13 offsets + the own-cell "later in sort
      order" rule), halving candidate gathers and distance checks;
    * **ids, not batch** - callers fold whatever must match into one id
      (e.g. ``batch * C + class``), so candidate slots are never wasted on
      rows a post-filter would drop;
    * **one reverse-edge co-sort** replaces per-iteration scatter pushes in
      the propagation loop: the forward edges are sorted by destination
      together with one sentinel query per row, giving each row's in-edges
      as a contiguous run (cap k).

    Returns (fwd [N, k], rev [N, k], trunc []) int32. The union fwd ∪ rev
    contains every in-radius same-id edge at least once in each direction (up
    to the k / cell_cap budgets). ``trunc`` counts rows whose connectivity was
    silently degraded (ADVICE r2): destinations whose in-edge run exceeded the
    k reverse slots (pull-only propagation can leave a hub's component split)
    plus valid rows whose shifted cell coordinate overflowed the ``bits``
    budget (key INVALID -> zero neighbors, e.g. batches whose samples keep
    distant absolute frames). Callers surface the count so over-dense or
    mis-framed tiles are detectable instead of silently under-merged.
    """
    n = pos.shape[0]
    cell = _shifted_cells(pos, ids, valid, radius, bits, num_ids)
    keys = pack_coords(ids, cell, bits, extra_invalid=jnp.logical_not(valid))
    order = jnp.argsort(keys)
    skeys = keys[order]
    pos_s = jnp.take(pos, order, axis=0)
    sorted_pos_of = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )

    offs = jnp.asarray(_HALF_OFFSETS)  # [13, 3]
    q_cells = cell[:, None, :] + offs[None, :, :]
    q_ids = jnp.broadcast_to(ids[:, None], (n, 13))
    inv_mask = jnp.broadcast_to(jnp.logical_not(valid)[:, None], (n, 13))
    q_keys = pack_coords(
        q_ids.reshape(-1), q_cells.reshape(-1, 3), bits,
        extra_invalid=inv_mask.reshape(-1),
    ).reshape(n, 13)
    start13 = run_starts(skeys, q_keys)
    # own cell: only rows strictly after me in sort order (dedups in-cell pairs)
    start = jnp.concatenate([start13, (sorted_pos_of + 1)[:, None]], axis=1)
    q_keys = jnp.concatenate(
        [q_keys, jnp.where(valid, keys, INVALID_KEY)[:, None]], axis=1
    )  # [N, 14]

    slot = jnp.arange(cell_cap, dtype=jnp.int32)
    cand = jnp.minimum(start[:, :, None] + slot[None, None, :], n - 1)
    in_cell = jnp.take(skeys, cand) == q_keys[:, :, None]
    d = pos[:, None, None, :] - jnp.take(pos_s, cand, axis=0)
    dist2 = jnp.sum(d * d, axis=-1)
    ok = in_cell & (dist2 <= radius * radius) & (q_keys[:, :, None] != INVALID_KEY)

    m = 14 * cell_cap
    dist2 = jnp.where(ok, dist2, jnp.inf).reshape(n, m)
    candf = jnp.where(ok, cand, 0).reshape(n, m)
    kk = min(k, m)
    neg, sel = jax.lax.top_k(-dist2, kk)
    sel_sorted = jnp.take_along_axis(candf, sel, axis=1)
    fwd = jnp.take(order, sel_sorted)
    fwd = jnp.where(jnp.isfinite(-neg), fwd, -1)  # [N, kk]

    key_overflow = jnp.sum((valid & (keys == INVALID_KEY)).astype(jnp.int32))
    if not with_reverse:  # profiling/one-directional uses
        if kk < k:
            fwd = jnp.concatenate(
                [fwd, jnp.full((n, k - kk), -1, jnp.int32)], axis=1
            )
        return fwd, jnp.full((n, k), -1, jnp.int32), key_overflow

    # Reverse edges: stable-argsort the forward destinations; each dst's
    # in-edges form a contiguous run, and because the flattened [N, kk] edge
    # array is row-major, the source of sorted slot p is simply order[p]//kk -
    # no second key or 64-bit packing needed. Run starts come from one
    # scatter-min of positions (slots past a run fail the dst-equality check,
    # so rows with no in-edges are naturally all -1).
    nkk = n * kk
    dstf = jnp.where(fwd >= 0, fwd, n).reshape(-1)  # [N*kk], n = padding
    sorder = jnp.argsort(dstf, stable=True)
    dst_sorted = jnp.take(dstf, sorder)
    src_sorted = (sorder // kk).astype(jnp.int32)
    starts = jnp.full((n + 1,), nkk, jnp.int32).at[dst_sorted].min(
        jnp.arange(nkk, dtype=jnp.int32)
    )
    rslot = jnp.arange(k, dtype=jnp.int32)
    rcand = jnp.minimum(starts[:n, None] + rslot[None, :], nkk - 1)
    rok = jnp.take(dst_sorted, rcand) == jnp.arange(n, dtype=jnp.int32)[:, None]
    rev = jnp.where(rok, jnp.take(src_sorted, rcand), -1)
    # rows whose in-edge run continues past the k reverse slots (one gather:
    # is the (k+1)-th run entry still this destination?)
    over = jnp.take(
        dst_sorted, jnp.minimum(starts[:n] + k, nkk - 1)
    ) == jnp.arange(n, dtype=jnp.int32)
    trunc = jnp.sum(over.astype(jnp.int32)) + key_overflow
    if kk < k:
        fwd = jnp.concatenate(
            [fwd, jnp.full((n, k - kk), -1, jnp.int32)], axis=1
        )
    return fwd, rev, trunc
