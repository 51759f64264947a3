"""Async input pipeline: ordering, determinism, error propagation."""

import numpy as np
import pytest

from panopticsegforlargescalepointcloud_tpu.data.prefetch import BatchPrefetcher


def test_ordered_and_deterministic():
    def make(rng):
        return rng.integers(0, 1 << 30)

    a = BatchPrefetcher(make, seed=7, num_workers=3, prefetch=4)
    got = [next(a) for _ in range(20)]
    a.close()
    b = BatchPrefetcher(make, seed=7, num_workers=1, prefetch=2)
    got2 = [next(b) for _ in range(20)]
    b.close()
    sync = BatchPrefetcher(make, seed=7, num_workers=0)
    got3 = [next(sync) for _ in range(20)]
    assert got == got2 == got3  # worker count never changes the stream


def test_error_propagates():
    def boom(rng):
        raise ValueError("bad tile")

    p = BatchPrefetcher(boom, seed=0, num_workers=2, prefetch=2)
    with pytest.raises(ValueError, match="bad tile"):
        next(p)
    p.close()
