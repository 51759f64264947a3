"""Bucketed device hash table: O(1) voxel-key lookups as pure gathers.

The sort-join lookup (hashing.lookup method='sort') still co-sorts ~14-27x N
elements per kernel map; profiling shows those sorts dominate hierarchy
construction. This table trades them for ONE N-element sort at build time per
level, after which every lookup is a single contiguous [slots]-wide gather +
compare - the TPU-friendly analogue of MinkowskiEngine's C++ hash map.

Layout: ``num_buckets`` buckets of ``slots`` consecutive (key, row) entries.
Keys are assigned to bucket ``mix(key) & (B-1)``; within a bucket they occupy
slots in sorted-key order. With slots=16 and B >= N/4 the average load is
<= 4/16, so overflow (rank >= slots, dropped with a counter) is ~1e-6 rare;
callers surface the counter as a health metric.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import INVALID_KEY

_MIX = np.uint32(2654435761)


def _bucket_of(keys: jnp.ndarray, bucket_bits: int) -> jnp.ndarray:
    h = keys * _MIX
    h = h ^ (h >> np.uint32(16))
    return (h & jnp.uint32((1 << bucket_bits) - 1)).astype(jnp.uint32)


class BucketTable(NamedTuple):
    keys: jnp.ndarray  # [B * slots] uint32, INVALID_KEY empty
    rows: jnp.ndarray  # [B * slots] int32, -1 empty
    bucket_bits: int
    slots: int
    overflow: jnp.ndarray  # [] int32 dropped keys


def bucket_bits_for(capacity: int, target_load: int = 4) -> int:
    b = 1
    while (1 << b) * target_load < capacity:
        b += 1
    return b


def build_bucket_table(
    keys: jnp.ndarray,
    bucket_bits: int | None = None,
    slots: int = 16,
) -> BucketTable:
    """Build the table from (possibly padded) keys; row payload = key index."""
    n = keys.shape[0]
    if bucket_bits is None:
        bucket_bits = bucket_bits_for(n)
    nb = 1 << bucket_bits
    valid = keys != INVALID_KEY
    b = jnp.where(valid, _bucket_of(keys, bucket_bits).astype(jnp.int32), nb)
    order = jnp.argsort(b)
    sb = jnp.take(b, order)
    start = jnp.searchsorted(sb, jnp.arange(nb, dtype=jnp.int32)).astype(jnp.int32)
    rank = jnp.arange(n, dtype=jnp.int32) - jnp.take(
        start, jnp.minimum(sb, nb - 1)
    )
    ok = (sb < nb) & (rank < slots)
    tgt = jnp.where(ok, sb * slots + rank, nb * slots)
    tkeys = jnp.full((nb * slots,), INVALID_KEY, jnp.uint32).at[tgt].set(
        jnp.take(keys, order), mode="drop"
    )
    trows = jnp.full((nb * slots,), -1, jnp.int32).at[tgt].set(
        order.astype(jnp.int32), mode="drop"
    )
    overflow = jnp.sum(((sb < nb) & (rank >= slots)).astype(jnp.int32))
    return BucketTable(tkeys, trows, bucket_bits, slots, overflow)


def bucket_lookup(table: BucketTable, queries: jnp.ndarray) -> jnp.ndarray:
    """Row index for each query key (-1 absent / invalid). Any shape."""
    shape = queries.shape
    q = queries.reshape(-1)
    b = _bucket_of(q, table.bucket_bits).astype(jnp.int32)
    base = b * table.slots
    idx = base[:, None] + jnp.arange(table.slots, dtype=jnp.int32)[None, :]
    cand_keys = jnp.take(table.keys, idx)  # [M, S] contiguous per row
    cand_rows = jnp.take(table.rows, idx)
    hit = (cand_keys == q[:, None]) & (q != INVALID_KEY)[:, None]
    row = jnp.max(jnp.where(hit, cand_rows, -1), axis=1)
    return row.reshape(shape)
