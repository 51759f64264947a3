"""Bucket hash table parity vs exact sorted lookup."""

import jax.numpy as jnp
import numpy as np

from panopticsegforlargescalepointcloud_tpu.ops.bucket import (
    BucketTable,
    bucket_lookup,
    build_bucket_table,
)
from panopticsegforlargescalepointcloud_tpu.ops.hashing import INVALID_KEY, lookup


class TestBucketTable:
    def test_lookup_parity(self, rng):
        n = 5000
        keys = np.unique(rng.integers(0, 2 ** 31, size=n).astype(np.uint32))
        keys = np.sort(keys)
        cap = len(keys) + 200
        padded = np.full(cap, INVALID_KEY, np.uint32)
        padded[: len(keys)] = keys
        table = build_bucket_table(jnp.asarray(padded))
        assert int(table.overflow) == 0

        # present queries resolve to their row
        got = np.asarray(bucket_lookup(table, jnp.asarray(padded)))
        np.testing.assert_array_equal(got[: len(keys)], np.arange(len(keys)))
        assert np.all(got[len(keys):] == -1)

        # absent queries miss
        absent = rng.integers(0, 2 ** 31, size=1000).astype(np.uint32)
        absent = absent[~np.isin(absent, keys)]
        got2 = np.asarray(bucket_lookup(table, jnp.asarray(absent)))
        assert np.all(got2 == -1)

        # agrees with the exact sorted lookup on a mixed batch
        mix = np.concatenate([keys[:500], absent[:500]])
        exact = np.asarray(lookup(jnp.asarray(padded), jnp.asarray(mix)))
        fast = np.asarray(bucket_lookup(table, jnp.asarray(mix)))
        np.testing.assert_array_equal(exact, fast)
