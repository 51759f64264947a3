"""Neighbor-count diagnostics (reference ``utils/debugging_vars.py:1-48``).

The reference's ``FIND_NEIGHBOUR_DIST`` mode histograms how many neighbors
each point finds inside the clustering radius, to tune ``nsample``/radius.
Here the same diagnostic runs over our fixed-K grid-hash neighbor search:
besides the count histogram it reports the *saturation fraction* - how many
points hit the static K budget (those would have found more neighbors with a
bigger K, the fixed-shape analog of the reference's truncation concern).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

DEBUGGING_VARS = {"FIND_NEIGHBOUR_DIST": False}


class DistributionNeighbour:
    """Histogram of per-point neighbor counts at one radius."""

    def __init__(self, radius: float, bins: int = 1000):
        self._radius = radius
        self._bins = bins
        self._histogram = np.zeros(bins)

    def reset(self):
        self._histogram = np.zeros(self._bins)

    @property
    def radius(self):
        return self._radius

    @property
    def histogram(self):
        return self._histogram

    @property
    def histogram_non_zero(self):
        nz = np.nonzero(self._histogram)[0]
        return self._histogram[: nz[-1] + 1] if len(nz) else self._histogram[:0]

    def add_valid_neighbours(self, counts):
        self._histogram += np.bincount(
            np.clip(np.asarray(counts, np.int64), 0, self._bins - 1),
            minlength=self._bins,
        )


def neighbour_count_stats(
    pos,
    batch,
    valid,
    radius: float,
    k: int,
    meter: DistributionNeighbour | None = None,
) -> Dict[str, float]:
    """Run the clustering neighbor search once and summarize the counts.

    Returns mean/median neighbor count and the fraction of points saturating
    the K budget; optionally accumulates into ``meter``.
    """
    from ..cluster.neighbors import radius_neighbors

    idx, _ = radius_neighbors(pos, batch, valid, radius, k=k)
    counts = np.asarray((np.asarray(idx) >= 0).sum(-1))[np.asarray(valid)]
    if meter is not None:
        meter.add_valid_neighbours(counts)
    if len(counts) == 0:
        return {"nbr_mean": 0.0, "nbr_median": 0.0, "nbr_saturated": 0.0}
    return {
        "nbr_mean": float(counts.mean()),
        "nbr_median": float(np.median(counts)),
        "nbr_saturated": float((counts >= k).mean()),
    }
