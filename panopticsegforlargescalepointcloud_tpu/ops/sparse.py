"""Fixed-shape sparse voxel grids and kernel-map construction.

This module is the TPU-native replacement for MinkowskiEngine's coordinate
manager + kernel-map machinery (the C++/CUDA core behind every sparse conv in
the reference, see ``/root/reference/torch_points3d/modules/MinkowskiEngine/``).

Design (idiomatic XLA, everything static-shaped under jit):

* A :class:`SparseGrid` is a padded array of occupied voxels in *canonical
  key-sorted order*: packed uint32 keys ascending, INVALID_KEY padding at the
  end. Canonical order makes every hash lookup a binary search and makes
  downsampling a sort-free compaction.
* Kernel maps are dense ``[N, K]`` int32 neighbor-index tables (-1 = absent),
  built once per level per step and shared by every conv at that level
  (mirroring ME's kernel-map cache). K = 27 for kernel size 3.
* Downsampling (stride 2) computes coarse coords = floor(fine / 2), compacts
  unique keys with a cumsum, and records the fine->coarse parent map.
  Coordinates at level L are stored *divided by 2^L* ("stride units"), so the
  stride-2 conv at any level reads ``fine = 2 * coarse + offset`` and the
  transpose conv reads ``coarse = (fine + offset) / 2`` - identical code at
  all depths.

ME convention notes (for checkpoint-import parity): ME stores coordinates in
absolute units and its stride-2 kernel-3 output coords are
``unique(floor(in / 2s) * 2s)`` gathering inputs at ``out + off * s`` for
``off in {-1,0,1}^3``; in stride units that is exactly ``2c + off``. The
transpose conv writes onto the cached finer coordinate map (coords reuse),
which here is simply the retained fine-level grid.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .bucket import BucketTable, bucket_lookup
from .hashing import BitLayout, DEFAULT_BITS, INVALID_KEY, lookup, pack_coords


def _kernel_offsets(kernel_size: int) -> np.ndarray:
    """All integer offsets of a centered cubic kernel, shape [K, 3].

    Order is z-fastest (lexicographic in (dx, dy, dz)); arbitrary but fixed -
    it defines the weight layout W[k] and matters only for checkpoint import.
    """
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        rng = np.arange(-r, r + 1)
    else:
        # Even kernels in ME span {0, 1, ..., k-1} (forward-biased).
        rng = np.arange(0, kernel_size)
    grid = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int32)


KERNEL_OFFSETS_K3 = _kernel_offsets(3)
KERNEL_OFFSETS_K2 = _kernel_offsets(2)
KERNEL_OFFSETS_K1 = _kernel_offsets(1)


class SparseGrid(NamedTuple):
    """A padded, canonically key-sorted set of occupied voxels.

    Attributes:
      coords: [N, 3] int32 voxel coords in units of the level's stride.
        Padding rows hold 0.
      batch: [N] int32 per-voxel sample id. Padding rows hold -1.
      keys: [N] uint32 packed keys, ascending, INVALID_KEY for padding.
      mask: [N] bool valid-row mask.
    """

    coords: jnp.ndarray
    batch: jnp.ndarray
    keys: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))


def make_grid(
    batch: jnp.ndarray,
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    bits: BitLayout = DEFAULT_BITS,
    dedup: bool = True,
    capacity: int | None = None,
) -> Tuple[SparseGrid, jnp.ndarray]:
    """Build a canonical SparseGrid from (possibly unsorted, possibly
    duplicated) voxel coordinates.

    Duplicates (same packed key) are merged when ``dedup``; the returned
    ``inverse`` maps each input row to its grid row (-1 for invalid inputs),
    which callers use to pool point features into voxels.

    ``capacity`` (dedup only) sizes the output grid below the input row count
    when the caller knows uniques are far fewer (e.g. the ScoreNet grid);
    uniques past it are dropped (their inverse is -1 - count those rows to
    surface overflow).

    Returns:
      (grid, inverse [N_in] int32)
    """
    keys = pack_coords(batch, coords, bits, extra_invalid=jnp.logical_not(mask))
    order = jnp.argsort(keys)
    skeys = keys[order]
    if dedup:
        first = jnp.concatenate(
            [jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]]
        )
        first = first & (skeys != INVALID_KEY)
        # Position of each sorted row's representative among the uniques.
        uidx = jnp.cumsum(first.astype(jnp.int32)) - 1
        n = keys.shape[0]
        m = n if capacity is None else int(capacity)
        uidx = jnp.where(uidx < m, uidx, -1)
        out_keys = jnp.full((m,), INVALID_KEY, dtype=jnp.uint32)
        out_keys = out_keys.at[jnp.where(first & (uidx >= 0), uidx, m)].set(
            skeys, mode="drop"
        )
        out_batch = jnp.full((m,), -1, dtype=jnp.int32)
        out_batch = out_batch.at[jnp.where(first & (uidx >= 0), uidx, m)].set(
            batch[order], mode="drop"
        )
        out_coords = jnp.zeros((m, 3), dtype=jnp.int32)
        out_coords = out_coords.at[jnp.where(first & (uidx >= 0), uidx, m)].set(
            coords[order], mode="drop"
        )
        out_mask = out_keys != INVALID_KEY
        # inverse: input row -> unique row (-1 for invalid or past capacity).
        inv_sorted = jnp.where(skeys != INVALID_KEY, uidx, -1)
        inverse = jnp.zeros((n,), dtype=jnp.int32).at[order].set(inv_sorted)
        grid = SparseGrid(out_coords, out_batch, out_keys, out_mask)
        return grid, inverse
    else:
        grid = SparseGrid(
            coords[order],
            jnp.where(keys[order] != INVALID_KEY, batch[order], -1),
            skeys,
            skeys != INVALID_KEY,
        )
        n = keys.shape[0]
        inverse = (
            jnp.zeros((n,), dtype=jnp.int32)
            .at[order]
            .set(jnp.arange(n, dtype=jnp.int32))
        )
        inverse = jnp.where(keys != INVALID_KEY, inverse, -1)
        return grid, inverse


def same_level_map(
    grid: SparseGrid,
    kernel_offsets: np.ndarray = KERNEL_OFFSETS_K3,
    bits: BitLayout = DEFAULT_BITS,
    symmetric: bool = True,
    table: BucketTable | None = None,
) -> jnp.ndarray:
    """Kernel map for a stride-1 (submanifold) conv: out row i gathers input
    rows ``map[i, k]`` located at ``coords[i] + offsets[k]``.

    With ``symmetric`` (odd centered kernels only) just the first (K-1)/2
    offsets are looked up; the mirrored half follows by transposition
    (nbr[i, k] = j  <=>  nbr[j, K-1-k] = i) and the center is the identity -
    halving the dominant hash-lookup cost.

    Returns [N, K] int32 (-1 = no neighbor / padding row).
    """
    n = grid.capacity
    k = kernel_offsets.shape[0]
    use_sym = symmetric and np.array_equal(kernel_offsets, -kernel_offsets[::-1])
    kq = (k - 1) // 2 if use_sym else k
    offs = jnp.asarray(kernel_offsets[:kq])  # [Kq, 3]
    q_coords = grid.coords[:, None, :] + offs[None, :, :]  # [N, Kq, 3]
    q_batch = jnp.broadcast_to(grid.batch[:, None], (n, kq))
    invalid = jnp.broadcast_to(jnp.logical_not(grid.mask)[:, None], (n, kq))
    q_keys = pack_coords(
        q_batch.reshape(-1), q_coords.reshape(-1, 3), bits, extra_invalid=invalid.reshape(-1)
    )
    if table is not None:
        half = bucket_lookup(table, q_keys).reshape(n, kq)
    else:
        half = lookup(grid.keys, q_keys).reshape(n, kq)
    if not use_sym:
        return half
    nbr = jnp.full((n, k), -1, jnp.int32)
    nbr = nbr.at[:, :kq].set(half)
    self_idx = jnp.where(grid.mask, jnp.arange(n, dtype=jnp.int32), -1)
    nbr = nbr.at[:, kq].set(self_idx)
    # transpose the first half into the mirrored second half
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, kq))
    cols = jnp.broadcast_to(
        (k - 1) - jnp.arange(kq, dtype=jnp.int32)[None, :], (n, kq)
    )
    tgt = jnp.where(half >= 0, jnp.maximum(half, 0) * k + cols, n * k)
    flat = nbr.reshape(-1).at[tgt.reshape(-1)].set(rows.reshape(-1), mode="drop")
    return flat.reshape(n, k)


def downsample(
    fine: SparseGrid,
    capacity: int,
    bits: BitLayout = DEFAULT_BITS,
) -> Tuple[SparseGrid, jnp.ndarray]:
    """Stride-2 coordinate downsampling: coarse coords = floor(fine / 2).

    Mirrors ME's stride-2 output-coordinate generation
    (``unique(floor(in/2s)*2s)``). ``capacity`` is the static row budget of
    the coarse level; overflowing voxels (beyond capacity after unique) are
    dropped deterministically (highest keys first) - size capacities so this
    never triggers in practice (a warning metric is exposed by callers).

    Returns:
      (coarse grid, parent [N_fine] int32 map fine row -> coarse row, -1 pad)
    """
    coarse_coords = jnp.floor_divide(fine.coords, 2)
    keys = pack_coords(
        fine.batch, coarse_coords, bits, extra_invalid=jnp.logical_not(fine.mask)
    )
    order = jnp.argsort(keys)
    skeys = keys[order]
    first = jnp.concatenate([jnp.ones((1,), dtype=bool), skeys[1:] != skeys[:-1]])
    first = first & (skeys != INVALID_KEY)
    uidx = jnp.cumsum(first.astype(jnp.int32)) - 1  # [N_fine]
    out_keys = jnp.full((capacity,), INVALID_KEY, dtype=jnp.uint32)
    tgt = jnp.where(first & (uidx < capacity), uidx, capacity)
    out_keys = out_keys.at[tgt].set(skeys, mode="drop")
    out_batch = jnp.full((capacity,), -1, dtype=jnp.int32)
    out_batch = out_batch.at[tgt].set(fine.batch[order], mode="drop")
    out_coords = jnp.zeros((capacity, 3), dtype=jnp.int32)
    out_coords = out_coords.at[tgt].set(coarse_coords[order], mode="drop")
    coarse = SparseGrid(out_coords, out_batch, out_keys, out_keys != INVALID_KEY)

    parent_sorted = jnp.where((skeys != INVALID_KEY) & (uidx < capacity), uidx, -1)
    n_fine = fine.capacity
    parent = jnp.zeros((n_fine,), dtype=jnp.int32).at[order].set(parent_sorted)
    return coarse, parent


def down_map(
    fine: SparseGrid,
    coarse: SparseGrid,
    kernel_offsets: np.ndarray = KERNEL_OFFSETS_K3,
    bits: BitLayout = DEFAULT_BITS,
    fine_table: BucketTable | None = None,
) -> jnp.ndarray:
    """Kernel map for a stride-2 conv: coarse out row i gathers fine rows at
    ``2 * coarse_coords[i] + offsets[k]`` (ME stride-2 kernel-3 semantics in
    stride units).

    Returns [N_coarse, K] int32 into fine rows.
    """
    n = coarse.capacity
    k = kernel_offsets.shape[0]
    offs = jnp.asarray(kernel_offsets)
    q_coords = 2 * coarse.coords[:, None, :] + offs[None, :, :]
    q_batch = jnp.broadcast_to(coarse.batch[:, None], (n, k))
    invalid = jnp.broadcast_to(jnp.logical_not(coarse.mask)[:, None], (n, k))
    q_keys = pack_coords(
        q_batch.reshape(-1), q_coords.reshape(-1, 3), bits, extra_invalid=invalid.reshape(-1)
    )
    if fine_table is not None:
        return bucket_lookup(fine_table, q_keys).reshape(n, k)
    return lookup(fine.keys, q_keys).reshape(n, k)


_DOWN_CHOICE = np.array(
    [[(j >> 2) & 1, (j >> 1) & 1, j & 1] for j in range(8)], dtype=np.int32
)


def down_map_fine_side(
    fine: SparseGrid,
    coarse: SparseGrid,
    bits: BitLayout = DEFAULT_BITS,
) -> jnp.ndarray:
    """Equivalent of :func:`down_map` built from the fine side: each fine
    voxel f has at most 8 coarse receivers c with f = 2c + off, |off| <= 1
    (per axis c in {floor((f-1)/2), floor((f+1)/2)}), so 8*N_fine lookups into
    the (smaller) coarse table replace 27*N_coarse lookups into the fine one -
    ~2.4x less lookup-sort volume. Results are scattered into [N_c, 27]
    (collision-free: (c, off) determines f)."""
    n = fine.capacity
    nc = coarse.capacity
    f = fine.coords
    cand = jnp.stack(
        [jnp.floor_divide(f - 1, 2), jnp.floor_divide(f + 1, 2)], axis=1
    )  # [N, 2, 3]
    choice = jnp.asarray(_DOWN_CHOICE)  # [8, 3]
    c_comb = jnp.take_along_axis(
        cand, jnp.broadcast_to(choice[None], (n, 8, 3)), axis=1
    )  # [N, 8, 3]
    off = f[:, None, :] - 2 * c_comb  # in {-1, 0, 1, +-2}
    valid = jnp.all(jnp.abs(off) <= 1, axis=-1) & fine.mask[:, None]  # [N, 8]
    k = ((off[..., 0] + 1) * 3 + (off[..., 1] + 1)) * 3 + (off[..., 2] + 1)
    q_batch = jnp.broadcast_to(fine.batch[:, None], (n, 8))
    q_keys = pack_coords(
        q_batch.reshape(-1),
        c_comb.reshape(-1, 3),
        bits,
        extra_invalid=jnp.logical_not(valid).reshape(-1),
    )
    c_row = lookup(coarse.keys, q_keys).reshape(n, 8)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, 8))
    tgt = jnp.where(c_row >= 0, c_row * 27 + k, nc * 27)
    dmap = jnp.full((nc * 27,), -1, jnp.int32).at[tgt.reshape(-1)].set(
        rows.reshape(-1), mode="drop"
    )
    return dmap.reshape(nc, 27)


def up_map_from_down(dmap: jnp.ndarray, n_fine: int) -> jnp.ndarray:
    """Derive the transpose-conv kernel map by transposing the down map
    (identical connectivity: fine f = 2c + off  <=>  up offset -off), saving
    all hash lookups. umap[f, K-1-k] = c wherever dmap[c, k] = f; the mapping
    is collision-free because (f, off) determines c uniquely.

    Returns [N_fine, K] int32 into coarse rows.
    """
    nc, k = dmap.shape
    cols = jnp.broadcast_to(
        (k - 1) - jnp.arange(k, dtype=jnp.int32)[None, :], (nc, k)
    )
    crows = jnp.broadcast_to(jnp.arange(nc, dtype=jnp.int32)[:, None], (nc, k))
    tgt = jnp.where(dmap >= 0, jnp.maximum(dmap, 0) * k + cols, n_fine * k)
    flat = jnp.full((n_fine * k,), -1, jnp.int32).at[tgt.reshape(-1)].set(
        crows.reshape(-1), mode="drop"
    )
    return flat.reshape(n_fine, k)


# ---------------------------------------------------------------------------
# Derived kernel maps: the stride-2 hierarchy doubles as a brick tiling
# (coarse voxel c = 2x2x2 brick of fine voxels), so once the coarse level's
# own 27-map exists, BOTH the fine 27-map and the stride-2 down map follow by
# pure index arithmetic - no hash lookups, no sorts. Only the topmost (tiny)
# level needs a sort-join lookup; this removed the dominant kernel-map build
# cost (the old path sorted ~14N keys per level, see PLAN.md r2).
# ---------------------------------------------------------------------------


def _same_map_parity_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Static tables for deriving a fine 27-map from the coarse 27-map.

    For a fine voxel c with per-axis parities p (bit = c&1) and kernel offset
    o, the neighbor q = c + o lives in coarse voxel floor(q/2) = floor(c/2) +
    delta with per-axis delta in {-1,0,1} depending only on (parity, o), at
    brick slot q&1. Returns (KOFF [8, 27] coarse-offset index, SLOT [8, 27]
    slot index), parity code = px*4 + py*2 + pz.
    """
    koff = np.zeros((8, 27), np.int32)
    slot = np.zeros((8, 27), np.int32)
    for p in range(8):
        par = ((p >> 2) & 1, (p >> 1) & 1, p & 1)
        for k, o in enumerate(KERNEL_OFFSETS_K3):
            d = [0, 0, 0]
            s = [0, 0, 0]
            for a in range(3):
                q = par[a] + int(o[a])  # c ~ parity mod 2; q parity-level coord
                d[a] = q >> 1  # floor((c+o)/2) - floor(c/2) for c = 2m + par
                s[a] = q & 1
            koff[p, k] = ((d[0] + 1) * 3 + (d[1] + 1)) * 3 + (d[2] + 1)
            slot[p, k] = s[0] * 4 + s[1] * 2 + s[2]
    return koff, slot


_SAME_KOFF, _SAME_SLOT = _same_map_parity_tables()

# Down map statics: coarse output c gathers fine q = 2c + o; q's brick is
# floor(q/2) = c + floor(o/2) (delta in {-1,0}), at slot o&1 per axis.
_DOWN_KOFF = np.array(
    [
        (((int(o[0]) >> 1) + 1) * 3 + ((int(o[1]) >> 1) + 1)) * 3
        + ((int(o[2]) >> 1) + 1)
        for o in KERNEL_OFFSETS_K3
    ],
    np.int32,
)
_DOWN_SLOT = np.array(
    [
        (int(o[0]) & 1) * 4 + (int(o[1]) & 1) * 2 + (int(o[2]) & 1)
        for o in KERNEL_OFFSETS_K3
    ],
    np.int32,
)


def slot_table_from_parent(
    fine: SparseGrid, parent: jnp.ndarray, coarse_capacity: int
) -> jnp.ndarray:
    """[N_coarse, 8] int32: brick-slot table of the stride-2 tiling.

    slot_table[c, sx*4+sy*2+sz] = fine row of the voxel at 2*coarse + (sx,
    sy, sz), or -1. Collision-free (parent + slot determine the fine voxel).
    """
    par = (fine.coords & 1).astype(jnp.int32)
    slot = par[:, 0] * 4 + par[:, 1] * 2 + par[:, 2]
    ok = fine.mask & (parent >= 0)
    tgt = jnp.where(ok, parent * 8 + slot, coarse_capacity * 8)
    table = jnp.full((coarse_capacity * 8,), -1, jnp.int32)
    rows = jnp.arange(fine.capacity, dtype=jnp.int32)
    return table.at[tgt].set(rows, mode="drop").reshape(coarse_capacity, 8)


def _parity_permute(table_nk: jnp.ndarray, parity: jnp.ndarray, perm: np.ndarray):
    """out[i, k] = table_nk[i, perm[parity[i], k]] via 8 static permutations +
    selects (no dynamic per-element gather - TPU-friendly)."""
    res = table_nk[:, perm[0]]
    for p in range(1, 8):
        res = jnp.where((parity == p)[:, None], table_nk[:, perm[p]], res)
    return res


def derive_same_map(
    fine: SparseGrid,
    parent: jnp.ndarray,
    slot_table: jnp.ndarray,
    coarse_map: jnp.ndarray,
) -> jnp.ndarray:
    """Fine-level 27-neighbor map from the coarse 27-map + brick slot table.

    Exact equal to ``same_level_map(fine)`` whenever no voxel overflowed the
    coarse capacity (overflow is counted by the hierarchy builder).
    """
    n = fine.capacity
    par_bits = (fine.coords & 1).astype(jnp.int32)
    parity = par_bits[:, 0] * 4 + par_bits[:, 1] * 2 + par_bits[:, 2]
    ok = fine.mask & (parent >= 0)
    # coarse neighbors of my parent brick: [N, 27] row gather
    pnbr = jnp.take(coarse_map, jnp.maximum(parent, 0), axis=0)
    # pick, per (parity, k), which coarse neighbor holds voxel c + o_k
    nbr_brick = _parity_permute(pnbr, parity, _SAME_KOFF)
    # slot of c + o_k inside that brick (values depend only on parity, k)
    slot_vals = jnp.asarray(_SAME_SLOT)  # [8, 27]
    slot = jnp.take(slot_vals, parity, axis=0)  # [N, 27] row gather of 8 rows
    flat = slot_table.reshape(-1)
    idx = jnp.where(nbr_brick >= 0, nbr_brick * 8 + slot, slot_table.size - 1)
    rows = jnp.take(flat, idx)
    rows = jnp.where((nbr_brick >= 0) & ok[:, None], rows, -1)
    # the all-(-1) guard: slot_table.size-1 may be a real entry; mask instead
    return rows


def derive_down_map(coarse_map: jnp.ndarray, slot_table: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 kernel map (== down_map_fine_side) from the coarse 27-map +
    slot table: coarse c gathers fine 2c + o = slot (o&1) of brick
    c + floor(o/2)."""
    nbr_brick = coarse_map[:, _DOWN_KOFF]  # static column permutation
    flat = slot_table.reshape(-1)
    idx = jnp.where(
        nbr_brick >= 0,
        nbr_brick * 8 + jnp.asarray(_DOWN_SLOT)[None, :],
        slot_table.size - 1,
    )
    rows = jnp.take(flat, idx)
    return jnp.where(nbr_brick >= 0, rows, -1)


def up_map(
    fine: SparseGrid,
    coarse: SparseGrid,
    kernel_offsets: np.ndarray = KERNEL_OFFSETS_K3,
    bits: BitLayout = DEFAULT_BITS,
) -> jnp.ndarray:
    """Kernel map for a stride-2 *transpose* conv writing onto the cached fine
    coords (ME's coordinate-map reuse): fine out row i gathers coarse rows at
    ``(fine_coords[i] + offsets[k]) / 2`` where divisible.

    Weight sharing is the adjoint of :func:`down_map`: the connection
    fine f <- coarse c exists iff ``2c - f = -off``, so using offset index k
    here corresponds to down-conv weight at the *negated* offset; callers that
    import reference checkpoints must flip the K axis accordingly.

    Returns [N_fine, K] int32 into coarse rows.
    """
    n = fine.capacity
    k = kernel_offsets.shape[0]
    offs = jnp.asarray(kernel_offsets)
    cand = fine.coords[:, None, :] + offs[None, :, :]  # [N, K, 3]
    # Divisibility by 2 (floor semantics for negatives are fine because we
    # explicitly test the remainder).
    rem = cand - 2 * jnp.floor_divide(cand, 2)
    divisible = jnp.all(rem == 0, axis=-1)  # [N, K]
    q_coords = jnp.floor_divide(cand, 2)
    q_batch = jnp.broadcast_to(fine.batch[:, None], (n, k))
    invalid = jnp.logical_not(
        jnp.broadcast_to(fine.mask[:, None], (n, k)) & divisible
    )
    q_keys = pack_coords(
        q_batch.reshape(-1), q_coords.reshape(-1, 3), bits, extra_invalid=invalid.reshape(-1)
    )
    return lookup(coarse.keys, q_keys).reshape(n, k)


# ---------------------------------------------------------------------------
# Fused per-level map derivation. The derive_* functions above are exact but
# descriptor-bound on TPU: XLA prices a gather/scatter at ~7.5 ns per INDEX
# regardless of row width (scripts/probe_derive_parts.py: the flat [N*27]
# element-gather in derive_same_map is 26 of its 29 ms at 131k voxels, while
# an [N]-index row-gather of 27-wide rows costs 1 ms). So gather WHOLE
# slot-table rows with FEW indices: the 27 neighbors of a fine voxel live in
# the 8 bricks of its parity box {parent + d}, d per axis in {0, -1|+1 by
# parity} - 8 row-gathers of [N] indices replace the [N*27] element gather.
# Every box brick's row comes straight from pnbr = coarse_map[parent] (true
# rows - anchoring wide rows at intermediate bricks instead would silently
# drop neighbors whose anchor brick is empty). The down map's box is the
# static d in {-1,0}^3 read off coarse_map columns, and the up map needs no
# gather at all: its values ARE coarse rows already present in pnbr.
# Descriptor count per level: 9N + 7Nc vs same 27N + down 27Nc + up-scatter
# 27N before (~60 ms -> ~14 ms at the 131k-voxel L0).
# ---------------------------------------------------------------------------


def _box_same_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Static tables for the fine 27-map over parity-box brick rows.

    For fine voxel c = 2m + par and offset o: neighbor q = c + o lives in
    brick m + d with d = (par + o) >> 1, at slot q & 1. d_a is 0 or the
    parity-side sign, so the box index e_a = |d_a| in {0, 1}. Returns
    (KOFF8 [8, 8] koff index of d(e; parity), COL64 [8, 27] = e_index * 8 +
    slot)."""
    koff8 = np.zeros((8, 8), np.int32)
    col64 = np.zeros((8, 27), np.int32)
    for p in range(8):
        par = ((p >> 2) & 1, (p >> 1) & 1, p & 1)
        for e in range(8):
            ebits = ((e >> 2) & 1, (e >> 1) & 1, e & 1)
            d = [ebits[a] * (1 if par[a] else -1) for a in range(3)]
            koff8[p, e] = ((d[0] + 1) * 3 + (d[1] + 1)) * 3 + (d[2] + 1)
        for k, o in enumerate(KERNEL_OFFSETS_K3):
            q = [par[a] + int(o[a]) for a in range(3)]
            d = [q[a] >> 1 for a in range(3)]
            s = [q[a] & 1 for a in range(3)]
            e = (d[0] != 0) * 4 + (d[1] != 0) * 2 + (d[2] != 0)
            col64[p, k] = e * 8 + (s[0] * 4 + s[1] * 2 + s[2])
    return koff8, col64


def _box_down_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Static tables for the down map: coarse c gathers fine 2c + o living in
    brick c + d, d = o >> 1 in {-1, 0}^3 (box index e = -d), at slot o & 1.
    Returns (KOFFD [8] koff index of d(e), DCOL64 [27] = e_index * 8 + slot).
    """
    koffd = np.zeros((8,), np.int32)
    dcol = np.zeros((27,), np.int32)
    for e in range(8):
        d = [-((e >> (2 - a)) & 1) for a in range(3)]
        koffd[e] = ((d[0] + 1) * 3 + (d[1] + 1)) * 3 + (d[2] + 1)
    for k, o in enumerate(KERNEL_OFFSETS_K3):
        d = [int(o[a]) >> 1 for a in range(3)]
        s = [int(o[a]) & 1 for a in range(3)]
        e = (-d[0]) * 4 + (-d[1]) * 2 + (-d[2])
        dcol[k] = e * 8 + (s[0] * 4 + s[1] * 2 + s[2])
    return koffd, dcol


def _up_tables() -> Tuple[np.ndarray, np.ndarray]:
    """Static [8, 27] tables deriving the up map straight from pnbr.

    up_map column j holds coarse c with fine f = 2c - o_j, i.e. c =
    (f + o_j) / 2 - defined iff every axis of f + o_j is even (parity
    condition), and then c = floor(f/2) + d with d = (par + o_j) / 2 in
    {0, 1}^3, whose row is pnbr[f, koff(d)]. Returns (KOFF [8, 27] int32
    index into the 27 coarse offsets, VALID [8, 27] bool)."""
    koff = np.full((8, 27), 13, np.int32)  # center; masked where invalid
    valid = np.zeros((8, 27), bool)
    for p in range(8):
        par = ((p >> 2) & 1, (p >> 1) & 1, p & 1)
        for j, o in enumerate(KERNEL_OFFSETS_K3):
            q = [par[a] + int(o[a]) for a in range(3)]
            if all(v % 2 == 0 for v in q):
                d = [v // 2 for v in q]  # in {0, 1}
                koff[p, j] = ((d[0] + 1) * 3 + (d[1] + 1)) * 3 + (d[2] + 1)
                valid[p, j] = True
    return koff, valid


_BOX_KOFF8, _BOX_COL64 = _box_same_tables()
_BOX_KOFFD, _BOX_DCOL64 = _box_down_tables()
_UP_KOFF, _UP_VALID = _up_tables()


def _gather_pad(table: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Row gather where rows < 0 hit the table's trailing all--1 pad row."""
    pad = table.shape[0] - 1
    return jnp.take(table, jnp.where(rows >= 0, rows, pad), axis=0)


def _pad_rows(table: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [table, jnp.full((1, table.shape[1]), -1, table.dtype)], axis=0
    )


def derive_level_maps(
    fine: SparseGrid,
    parent: jnp.ndarray,
    slot_table: jnp.ndarray,
    coarse_map: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(same, down, up) kernel maps of one hierarchy level, fused.

    Exactly equal to (derive_same_map, derive_down_map,
    up_map_from_down(derive_down_map)) - pinned by tests/test_derived_maps.py
    - at a fraction of the gather-descriptor count (module comment above).
    """
    cmap_p = _pad_rows(coarse_map)  # [Nc+1, 27]
    st_p = _pad_rows(slot_table)  # [Nc+1, 8]

    pnbr = _gather_pad(cmap_p, parent)  # [N, 27]; dropped parents -> all -1
    par_bits = (fine.coords & 1).astype(jnp.int32)
    parity = par_bits[:, 0] * 4 + par_bits[:, 1] * 2 + par_bits[:, 2]

    # box brick rows: [N, 8] via 8 parity-selected static pnbr columns
    box_rows = _parity_permute(pnbr, parity, _BOX_KOFF8)
    # slots of the 8 box bricks, one row-gather per box slot -> [N, 64]
    vals = jnp.concatenate(
        [_gather_pad(st_p, box_rows[:, e]) for e in range(8)], axis=1
    )
    same = _parity_permute(vals, parity, _BOX_COL64)
    same = jnp.where(fine.mask[:, None], same, -1)

    dvals = jnp.concatenate(
        [
            slot_table if int(_BOX_KOFFD[e]) == 13
            else _gather_pad(st_p, coarse_map[:, _BOX_KOFFD[e]])
            for e in range(8)
        ],
        axis=1,
    )  # [Nc, 64]
    down = dvals[:, _BOX_DCOL64]

    up = _parity_permute(pnbr, parity, _UP_KOFF)
    up = jnp.where(jnp.asarray(_UP_VALID)[parity] & fine.mask[:, None], up, -1)
    return same, down, up
