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
4. flat-cluster extraction from the MST. Default ``selection="eom"``: the
   exact condensed-tree excess-of-mass rule, computed bottom-up in a single
   fixed-shape scan over the weight-sorted MST edges (see ``_eom_labels``) -
   per-branch stability ``sum_p lambda_p - |C| * lambda_birth``, children
   beat the parent iff their stability sum is larger, micro-splits below
   ``cluster_selection_epsilon`` suppressed, root never selected
   (allow_single_cluster=False like the reference's hdbscan call).
   ``selection="gap"`` keeps the cheaper rounds-1-2 approximation: a single
   global cut at the largest relative gap of the sorted MST weights, then
   thresholded components (can merge/split differently on variable-density
   data; fine for separated same-density blobs);
5. components smaller than ``min_cluster_size`` become noise (-1) and the
   rest are relabeled compactly by size.

Parity: ARI > 0.9 vs sklearn.cluster.HDBSCAN on synthetic blobs, and (eom
only) on variable-density + nested-cluster sets, tests/test_hdbscan.py.
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

    Returns (comp [Np] int32 min-id component label per point, (weights,
    edge_u, edge_v) each [rounds, Np] recorded merge edges, INF/0-padded;
    every merge records its edge once, ties may record an extra copy of an
    equal-weight edge - harmless for the cut statistics and skipped by the
    eom union-find via a same-root guard). ``mr`` must be INF on the
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
        # record each merge edge once: a pick is duplicated only when it is
        # mutual (c picks t AND t picks c) - then the smaller id records;
        # one-directional picks record unconditionally
        target_safe = jnp.minimum(target, n - 1)
        mutual = jnp.take(target, target_safe) == idx
        rec = has_edge & (~mutual | (idx < target))
        w_rec = jnp.where(rec, comp_w, _INF)
        u_rec = jnp.where(rec, rep_safe, 0).astype(jnp.int32)
        v_rec = jnp.where(rec, jnp.take(best_j, rep_safe), 0).astype(jnp.int32)
        # union along (c, target[c]) edges: hook-and-compress
        lab = idx
        for _ in range(16):
            lab = jnp.minimum(lab, jnp.take(lab, target))  # relax c -> t
            lab = lab.at[target].min(lab)  # relax t -> c
            lab = jnp.minimum(lab, jnp.take(lab, lab))  # path halving
        new_comp = jnp.where(comp < n, jnp.take(lab, comp_safe), n)
        return new_comp, (w_rec, u_rec, v_rec)

    comp, edges = jax.lax.scan(round_fn, comp0, None, length=rounds)
    return comp, edges


def _cut_threshold(
    weights: jnp.ndarray,
    epsilon: float,
    gap_ratio: float,
) -> jnp.ndarray:
    """Pick the single-linkage cut: midpoint of the FIRST qualifying relative
    gap in the top half of the sorted MST weights. Qualifying means
    w_hi > gap_ratio * w_lo and w_hi > epsilon. The top-half guard keeps
    near-duplicate-point gaps in the low tail from shattering everything; the
    first (not largest) gap cuts below ALL inter-cluster edges even when
    those edges are themselves spread out (inter-blob MST edges routinely
    differ by >gap_ratio, so the largest absolute gap can land between
    them and under-cluster). INF when nothing clears the bar."""
    w = jnp.sort(weights.reshape(-1))  # ascending, INF pads at the end
    finite = w < _INF
    cnt = jnp.sum(finite.astype(jnp.int32))
    pos_hi = jnp.arange(1, w.shape[0], dtype=jnp.int32)
    w_lo = w[:-1]
    w_hi = w[1:]
    ok = finite[1:] & (w_hi > gap_ratio * jnp.maximum(w_lo, 1e-12)) & (
        w_hi > epsilon
    ) & (w_lo > 0) & (2 * pos_hi >= cnt)
    i = jnp.argmax(ok)  # first qualifying gap (finest cut above the bulk)
    tau = jnp.where(ok[i], 0.5 * (w_lo[i] + w_hi[i]), _INF)
    return jnp.maximum(tau, epsilon)


def _eom_labels(
    edges_w: jnp.ndarray,  # [E] flat recorded MST edge weights, INF pad
    edges_u: jnp.ndarray,  # [E] endpoints (point ids)
    edges_v: jnp.ndarray,
    valid: jnp.ndarray,  # [Np]
    min_cluster_size: int,
    epsilon: float,
    max_clusters: int,
):
    """Condensed-tree excess-of-mass selection over the MST (exact HDBSCAN
    flat clustering, hdbscan/_hdbscan_tree.pyx condense_tree +
    get_clusters semantics), built bottom-up in one fixed-shape scan.

    Processing MST edges in increasing weight replays the single-linkage
    dendrogram leaf-to-root. Per live component we track size, the
    condensed-node lambda mass (sum over member points of 1/d at the merge
    where they last entered a >=mcs lineage), and the total stability of
    already-selected descendant clusters. When two real (>=mcs) components
    merge at distance d, both condensed nodes die with stability
    ``lambda_mass - size/d``; a node beats its selected descendants iff its
    stability >= their sum, in which case its current members take its label
    (overwriting descendant labels - the eom "deselect subtree" rule). Real
    merges at d < cluster_selection_epsilon are treated as continuations
    (micro-split suppression). The root is never selected
    (allow_single_cluster=False, the reference's hdbscan default), so a
    sample whose points form one unbroken lineage labels as noise - exactly
    like the Cython hdbscan.
    """
    n = valid.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    mcs = min_cluster_size

    # ascending weights; slack slots absorb tie-duplicate records
    order = jnp.argsort(edges_w)
    take = min(edges_w.shape[0], n + 16)
    ew = jnp.take(edges_w, order)[:take]
    eu = jnp.take(edges_u, order)[:take]
    ev = jnp.take(edges_v, order)[:take]

    state = (
        idx,  # root per point (min point id of its component)
        valid.astype(jnp.int32),  # size per root slot
        jnp.zeros((n,), jnp.float32),  # lambda mass per root slot
        jnp.zeros((n,), jnp.float32),  # selected-descendant stability
        jnp.full((n,), -1, jnp.int32),  # selected label per point
    )

    def step(state, edge):
        root, size, lam_mass, sel_stab, sel_label = state
        u, v, w = edge
        ra = root[u]
        rb = root[v]
        ok = (w < _INF) & (ra != rb)
        rc = jnp.minimum(ra, rb)
        sa = size[ra]
        sb = size[rb]
        lam = 1.0 / jnp.maximum(w, 1e-12)
        real_a = sa >= mcs
        real_b = sb >= mcs
        both = ok & real_a & real_b
        eval_sel = both & (w >= epsilon)

        stab_a = lam_mass[ra] - sa.astype(jnp.float32) * lam
        stab_b = lam_mass[rb] - sb.astype(jnp.float32) * lam
        sel_a = eval_sel & (stab_a >= sel_stab[ra])
        sel_b = eval_sel & (stab_b >= sel_stab[rb])
        in_a = root == ra
        in_b = root == rb
        sel_label = jnp.where(sel_a & in_a, ra, sel_label)
        sel_label = jnp.where(sel_b & in_b, rb, sel_label)

        sab = sa + sb
        fsab = sab.astype(jnp.float32)
        new_mass = jnp.where(
            eval_sel,
            fsab * lam,  # members re-enter the parent at this lambda
            jnp.where(
                both,  # epsilon continuation: masses concatenate
                lam_mass[ra] + lam_mass[rb],
                jnp.where(
                    real_a | real_b,  # chunk joins the real lineage
                    jnp.where(real_a, lam_mass[ra], lam_mass[rb])
                    + jnp.where(real_a, sb, sa).astype(jnp.float32) * lam,
                    # leaf birth: every member enters at this lambda
                    jnp.where(sab >= mcs, fsab * lam, 0.0),
                ),
            ),
        )
        new_sel = jnp.where(
            eval_sel,
            jnp.maximum(stab_a, sel_stab[ra])
            + jnp.maximum(stab_b, sel_stab[rb]),
            sel_stab[ra] + sel_stab[rb],
        )

        root = jnp.where(ok & (in_a | in_b), rc, root)
        size = size.at[rc].set(jnp.where(ok, sab, size[rc]))
        lam_mass = lam_mass.at[rc].set(jnp.where(ok, new_mass, lam_mass[rc]))
        sel_stab = sel_stab.at[rc].set(jnp.where(ok, new_sel, sel_stab[rc]))
        return (root, size, lam_mass, sel_stab, sel_label), None

    (root, _, _, _, sel_label), _ = jax.lax.scan(step, state, (eu, ev, ew))
    sel_label = jnp.where(valid, sel_label, -1)
    # compact selected root-ids to 0..K-1 by size (big clusters first)
    sizes = jax.ops.segment_sum(
        (sel_label >= 0).astype(jnp.int32),
        jnp.where(sel_label >= 0, sel_label, n),
        num_segments=n + 1,
    )[:n]
    order = jnp.argsort(-sizes)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    new_id = jnp.where((sizes > 0) & (rank < max_clusters), rank, -1)
    labels = jnp.where(
        sel_label >= 0, jnp.take(new_id, jnp.maximum(sel_label, 0)), -1
    )
    num = jnp.sum((new_id >= 0).astype(jnp.int32))
    return labels, num


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
        "min_samples", "min_cluster_size", "max_clusters", "gap_ratio",
        "epsilon", "selection",
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
    selection: str = "eom",
) -> HdbscanResult:
    """Batched density grouping (see module docstring).

    ``selection="eom"`` (default) runs exact condensed-tree excess-of-mass
    flat clustering over the MST (_eom_labels); ``"gap"`` keeps the cheaper
    single-global-threshold cut of rounds 1-2 (one extra Boruvka instead of
    the edge scan - fine for separated same-density clusters).
    """
    import math

    assert selection in ("eom", "gap"), selection
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

        _, (weights, eu, ev) = _boruvka(mr, v, rounds)
        if selection == "eom":
            return _eom_labels(
                weights.reshape(-1), eu.reshape(-1), ev.reshape(-1), v,
                min_cluster_size, epsilon, max_clusters,
            )
        tau = _cut_threshold(weights, epsilon, gap_ratio)
        mr_cut = jnp.where(mr <= tau, mr, _INF)
        comp, _ = _boruvka(mr_cut, v, rounds)
        return _compact_labels(comp, v, min_cluster_size, max_clusters)

    labels, num = jax.vmap(single)(points, valid)
    return HdbscanResult(labels=labels, num_clusters=num)
