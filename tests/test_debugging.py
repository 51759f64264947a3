"""FIND_NEIGHBOUR_DIST diagnostic (reference utils/debugging_vars.py)."""

import numpy as np

from panopticsegforlargescalepointcloud_tpu.utils.debugging import (
    DistributionNeighbour,
    neighbour_count_stats,
)


def test_neighbour_count_stats(rng):
    # a dense clump: everyone sees everyone within the radius
    pos = rng.normal(scale=0.05, size=(64, 3)).astype(np.float32)
    batch = np.zeros(64, np.int32)
    valid = np.ones(64, bool)
    meter = DistributionNeighbour(radius=1.0, bins=100)
    stats = neighbour_count_stats(pos, batch, valid, radius=1.0, k=16, meter=meter)
    assert stats["nbr_mean"] > 1.0
    assert stats["nbr_saturated"] == 1.0  # k=16 < 64 points in range
    assert meter.histogram.sum() == 64
    assert len(meter.histogram_non_zero) >= 1

    # isolated points: nobody sees anybody (exclude self handled by counts>=0)
    far = (np.arange(8)[:, None] * 100.0 * np.ones(3)).astype(np.float32)
    stats2 = neighbour_count_stats(
        far, np.zeros(8, np.int32), np.ones(8, bool), radius=1.0, k=4
    )
    assert stats2["nbr_saturated"] == 0.0
