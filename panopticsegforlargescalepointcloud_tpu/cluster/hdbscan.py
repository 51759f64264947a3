"""HDBSCAN-style density grouping, batched on TPU.

The reference clusters embeddings with the Cython ``hdbscan`` package
(min_cluster_size=15, min_samples=5, cluster_selection_epsilon=0.006) inside
a host multiprocessing pool, one process per cylinder
(``/root/reference/torch_points3d/utils/hdbscan_cluster.py:8-64``; consumed
by the PointGroupEmbed strategies,
``models/panoptic/pointgroupembed.py:219-330``). This module is the on-device
equivalent, designed fixed-shape for XLA:

1. pairwise distances -> per-point core distance (distance to the
   ``min_samples``-th nearest neighbor, self included - hdbscan's k-NN core
   distance);
2. mutual reachability d_mr(a, b) = max(d(a, b), core_a, core_b);
3. exact single-linkage MST over d_mr via Boruvka rounds (log2(Np) rounds of
   masked [Np, Np] min-reductions + pointer-jump unions - the same
   label-propagation machinery as cluster/region_grow.py);
4. a cut threshold from the MST edge weights: the largest relative gap in
   the top tail of the sorted weights (clusters = components that persist
   across a wide distance range), floored by ``cluster_selection_epsilon``;
   if no gap clears ``gap_ratio`` the sample is one cluster;
5. connected components of {d_mr <= tau} (Boruvka again, thresholded), then
   components smaller than ``min_cluster_size`` become noise (-1) and the
   rest are relabeled compactly by size.

Differences vs the exact HDBSCAN condensed-tree "eom" selection: the cut is
a single global threshold per sample rather than per-branch stability, which
matches HDBSCAN on separated clusters of comparable density (asserted
ARI > 0.9 vs sklearn.cluster.HDBSCAN on synthetic blobs in
tests/test_hdbscan.py) but can merge/split differently when cluster
densities vary wildly. Low-density points become noise the same way (their
large core distances exceed the cut, leaving sub-min-size components).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(3.4e38)


class HdbscanResult(NamedTuple):
    labels: jnp.ndarray  # [B, Np] int32 cluster id per point (-1 = noise/pad)
    num_clusters: jnp.ndarray  # [B] int32


def _pairwise_d(x: jnp.ndarray) -> jnp.ndarray:
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def _boruvka(mr: jnp.ndarray, valid: jnp.ndarray, rounds: int):
    """Boruvka connected components over the finite entries of ``mr``.

    Each round every component picks its minimum outgoing edge; the chosen
    edges are unioned with a hook-and-compress label relaxation (bidirectional
    scatter/gather-min + path halving - the label-of-label step doubles the
    covered edge distance per iteration, so 16 inner rounds resolve any
    chain up to 2^16 components).

    Returns (comp [Np] int32 min-id component label per point, weights
    [rounds, Np] recorded merge weights, INF-padded; every merge records at
    least its weight once, ties may record an extra copy of an equal-weight
    edge - harmless for the cut statistics). ``mr`` must be INF on the
    diagonal, on invalid rows/cols, and on excluded pairs.
    """
    n = mr.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    comp0 = jnp.where(valid, idx, n)  # padding points form a dummy component

    def round_fn(comp, _):
        comp_safe = jnp.minimum(comp, n - 1)
        same = comp[:, None] == comp[None, :]
        m = jnp.where(same, _INF, mr)
        best_w = jnp.min(m, axis=1)  # [Np] per point
        best_j = jnp.argmin(m, axis=1).astype(jnp.int32)
        # per-component minimum edge: segment-min over comp of best_w
        comp_w = jax.ops.segment_min(best_w, comp, num_segments=n + 1)[:n]
        has_edge = comp_w < _INF  # indexed by component id
        # representative point: lowest index achieving the component minimum
        is_best = (best_w <= jnp.take(comp_w, comp_safe)) & (comp < n) & (
            best_w < _INF
        )
        rep = jax.ops.segment_min(
            jnp.where(is_best, idx, n), comp, num_segments=n + 1
        )[:n]
        rep_safe = jnp.minimum(rep, n - 1)
        target = jnp.where(
            has_edge & (rep < n),
            jnp.take(comp, jnp.take(best_j, rep_safe)),
            idx,
        )  # [n] per component id: the component it merges with
        # record each undirected merge once (smaller component id records)
        w_rec = jnp.where(has_edge & (idx < target), comp_w, _INF)
        # union along (c, target[c]) edges: hook-and-compress
        lab = idx
        for _ in range(16):
            lab = jnp.minimum(lab, jnp.take(lab, target))  # relax c -> t
            lab = lab.at[target].min(lab)  # relax t -> c
            lab = jnp.minimum(lab, jnp.take(lab, lab))  # path halving
        new_comp = jnp.where(comp < n, jnp.take(lab, comp_safe), n)
        return new_comp, w_rec

    comp, weights = jax.lax.scan(round_fn, comp0, None, length=rounds)
    return comp, weights


def _cut_threshold(
    weights: jnp.ndarray,
    epsilon: float,
    gap_ratio: float,
) -> jnp.ndarray:
    """Pick the single-linkage cut: midpoint of the largest relative gap in
    the sorted MST weights (only gaps above ``epsilon`` and with
    w_hi > gap_ratio * w_lo count); INF when nothing clears the bar."""
    w = jnp.sort(weights.reshape(-1))  # ascending, INF pads at the end
    finite = w < _INF
    w_lo = w[:-1]
    w_hi = w[1:]
    ok = finite[1:] & (w_hi > gap_ratio * jnp.maximum(w_lo, 1e-12)) & (
        w_hi > epsilon
    ) & (w_lo > 0)
    # largest absolute gap among qualifying positions
    gap = jnp.where(ok, w_hi - w_lo, -1.0)
    i = jnp.argmax(gap)
    tau = jnp.where(gap[i] > 0, 0.5 * (w_lo[i] + w_hi[i]), _INF)
    return jnp.maximum(tau, epsilon)


def _compact_labels(comp, valid, min_cluster_size, max_clusters):
    n = comp.shape[0]
    sizes = jax.ops.segment_sum(
        valid.astype(jnp.int32), jnp.where(valid, comp, n), num_segments=n + 1
    )[:n]
    keep = sizes >= min_cluster_size  # indexed by root id
    # rank roots by size (descending) so the compact ids favor big clusters
    order = jnp.argsort(-jnp.where(keep, sizes, -1))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    new_id = jnp.where(keep & (rank < max_clusters), rank, -1)  # per root
    labels = jnp.where(valid, jnp.take(new_id, jnp.minimum(comp, n - 1)), -1)
    num = jnp.sum((new_id >= 0).astype(jnp.int32))
    return labels, num


@partial(
    jax.jit,
    static_argnames=(
        "min_samples", "min_cluster_size", "max_clusters", "gap_ratio", "epsilon",
    ),
)
def hdbscan_labels(
    points: jnp.ndarray,  # [B, Np, D]
    valid: jnp.ndarray,  # [B, Np]
    min_samples: int = 5,
    min_cluster_size: int = 15,
    epsilon: float = 0.006,
    max_clusters: int = 32,
    gap_ratio: float = 1.5,
) -> HdbscanResult:
    """Batched density grouping (see module docstring)."""
    import math

    n = points.shape[1]
    rounds = max(int(math.ceil(math.log2(max(n, 2)))) + 1, 4)

    def single(x, v):
        d = _pairwise_d(x.astype(jnp.float32))
        pair_ok = v[:, None] & v[None, :]
        d = jnp.where(pair_ok, d, _INF)
        dn = jnp.where(jnp.eye(n, dtype=bool), _INF, d)
        # core distance: min_samples-th nearest incl. self = (min_samples-1)
        # nearest among others; top_k on negated distances
        k = min(min_samples, n)
        neg = -jnp.where(jnp.eye(n, dtype=bool), 0.0, d)
        topk, _ = jax.lax.top_k(neg, k)
        core = -topk[:, k - 1]
        core = jnp.where(v, core, _INF)
        mr = jnp.maximum(dn, jnp.maximum(core[:, None], core[None, :]))
        mr = jnp.where(pair_ok, mr, _INF)

        _, weights = _boruvka(mr, v, rounds)
        tau = _cut_threshold(weights, epsilon, gap_ratio)
        mr_cut = jnp.where(mr <= tau, mr, _INF)
        comp, _ = _boruvka(mr_cut, v, rounds)
        return _compact_labels(comp, v, min_cluster_size, max_clusters)

    labels, num = jax.vmap(single)(points, valid)
    return HdbscanResult(labels=labels, num_clusters=num)
