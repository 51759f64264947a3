"""Voxel-coordinate hashing for sparse grids on TPU.

The reference stack (MinkowskiEngine) builds a host-side C++ hash table that maps
integer voxel coordinates to row indices (its "coordinate manager"). On TPU we
replace the hash table with a *sorted packed-key array* + vectorized binary
search (``jnp.searchsorted``): packing (batch, x, y, z) into one uint32 key
gives a total order, sorting once per level costs O(N log N) on the VPU, and
each kernel-offset lookup is a batched binary search that XLA vectorizes well.
Everything is fixed-shape: padding rows carry the key ``INVALID_KEY`` which
sorts last.

Reference behavior being reproduced (not copied): coordinate-manager insertion
and query of MinkowskiEngine as used by
``/root/reference/torch_points3d/applications/minkowski.py:113-126``.

Bit budget: 32 bits = bx + by + bz + batch bits. Coordinates are signed and
offset by half the range at pack time. Tiles are always centered cylinders
(radius <= 16 m / voxel 0.12 m ~= +-134 voxels), so the default layout
(10, 10, 8) -> x,y in [-512, 512), z in [-128, 128), batch in [0, 15) is ample;
NPM3D z after centering is well within +-12.8 m at 0.1 m voxels. Layouts are
static config - pick a wider one if your tiles are bigger.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BitLayout(NamedTuple):
    """Static bit allocation for key packing: x, y, z bits (batch gets the rest)."""

    bx: int = 10
    by: int = 10
    bz: int = 8

    @property
    def bb(self) -> int:
        return 32 - self.bx - self.by - self.bz

    @property
    def max_batch(self) -> int:
        # Reserve the all-ones batch field so INVALID_KEY can never collide
        # with a valid key.
        return (1 << self.bb) - 1


DEFAULT_BITS = BitLayout(10, 10, 8)

# Sorts after every valid key (valid keys have batch field < max_batch).
INVALID_KEY = np.uint32(0xFFFFFFFF)


def pack_coords(
    batch: jnp.ndarray,
    coords: jnp.ndarray,
    bits: BitLayout = DEFAULT_BITS,
    extra_invalid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pack (batch, x, y, z) int32 coords into sortable uint32 keys.

    Out-of-range coordinates (or rows flagged by ``extra_invalid``) map to
    INVALID_KEY so they never match a lookup and sort to the end.

    Args:
      batch: [N] int32 sample index within the device-local batch.
      coords: [N, 3] int32 signed voxel coordinates (units of current stride).
      bits: static bit layout.
      extra_invalid: optional [N] bool, True rows forced invalid (padding).

    Returns:
      [N] uint32 keys.
    """
    bx, by, bz = bits.bx, bits.by, bits.bz
    ox, oy, oz = 1 << (bx - 1), 1 << (by - 1), 1 << (bz - 1)
    x = coords[:, 0] + ox
    y = coords[:, 1] + oy
    z = coords[:, 2] + oz
    valid = (
        (x >= 0)
        & (x < (1 << bx))
        & (y >= 0)
        & (y < (1 << by))
        & (z >= 0)
        & (z < (1 << bz))
        & (batch >= 0)
        & (batch < bits.max_batch)
    )
    if extra_invalid is not None:
        valid = valid & jnp.logical_not(extra_invalid)
    key = (
        (batch.astype(jnp.uint32) << (bx + by + bz))
        | (x.astype(jnp.uint32) << (by + bz))
        | (y.astype(jnp.uint32) << bz)
        | z.astype(jnp.uint32)
    )
    return jnp.where(valid, key, jnp.uint32(INVALID_KEY))


def unpack_coords(
    keys: jnp.ndarray, bits: BitLayout = DEFAULT_BITS
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`pack_coords` (invalid keys give arbitrary output).

    Returns:
      (batch [N] int32, coords [N, 3] int32)
    """
    bx, by, bz = bits.bx, bits.by, bits.bz
    ox, oy, oz = 1 << (bx - 1), 1 << (by - 1), 1 << (bz - 1)
    z = (keys & ((1 << bz) - 1)).astype(jnp.int32) - oz
    y = ((keys >> bz) & ((1 << by) - 1)).astype(jnp.int32) - oy
    x = ((keys >> (by + bz)) & ((1 << bx) - 1)).astype(jnp.int32) - ox
    b = (keys >> (bx + by + bz)).astype(jnp.int32)
    return b, jnp.stack([x, y, z], axis=-1)


def lookup(
    sorted_keys: jnp.ndarray, query_keys: jnp.ndarray, method: str = "sort"
) -> jnp.ndarray:
    """Find row indices of query keys in a sorted key table.

    ``method="sort"`` co-sorts queries with the table (one XLA sort - far
    faster on TPU than the default sequential binary-search scan, which
    profiled ~6x the cost of the convs themselves); ``method="scan"`` falls
    back to jnp.searchsorted.

    Args:
      sorted_keys: [N] uint32 ascending (INVALID_KEY padding at the end).
      query_keys: [...] uint32 (INVALID_KEY entries never match).

    Returns:
      [...] int32 row index into ``sorted_keys``, or -1 if absent/invalid.
    """
    shape = query_keys.shape
    q = query_keys.reshape(-1)
    if method == "sort":
        n = sorted_keys.shape[0]
        m = q.shape[0]
        # Tag table entries with their row, queries with -1; stable-sort by
        # key with table entries ordered *before* equal-keyed queries, then
        # forward-propagate the last seen table row (cummax works because row
        # ids only grow along the sorted key order).
        all_keys = jnp.concatenate([sorted_keys, q])
        tag = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32), jnp.full((m,), -1, jnp.int32)]
        )
        order = jnp.argsort(all_keys, stable=True)  # table rows come first
        skeys = all_keys[order]
        stags = tag[order]
        last_row = jax.lax.cummax(jnp.where(stags >= 0, stags, -1))
        cand = jnp.where(last_row >= 0, last_row, 0)
        hit = (jnp.take(sorted_keys, cand) == skeys) & (last_row >= 0)
        res_sorted = jnp.where(hit, cand, -1)
        res = jnp.zeros((n + m,), jnp.int32).at[order].set(res_sorted)
        out = jnp.where(q != INVALID_KEY, res[n:], -1)
        return out.reshape(shape)
    idx = jnp.searchsorted(sorted_keys, q, side="left").astype(jnp.int32)
    idx = jnp.minimum(idx, sorted_keys.shape[0] - 1)
    hit = (sorted_keys[idx] == q) & (q != INVALID_KEY)
    return jnp.where(hit, idx, jnp.int32(-1)).reshape(shape)
