"""Batched flat-kernel mean-shift on TPU.

Replaces the reference's sklearn ``MeanShift(bandwidth, bin_seeding=True)``
run in a host ``multiprocessing.Pool`` with one process per cylinder
(``/root/reference/torch_points3d/utils/meanshift_cluster.py:9-18,95-101``).
Here the whole batch is clustered on device: samples become a leading vmap
axis, seeds a padded axis, and each flat-kernel iteration is one masked
[S, Np] distance matrix (MXU-shaped: |s-x|^2 = s^2 + x^2 - 2 s.x).

Algorithm parity with sklearn MeanShift:
  * bin seeding: seeds = centers of occupied bandwidth-sized bins
    (top-``max_seeds`` bins by occupancy when over budget);
  * iterate: seed <- mean of points within `bandwidth` (flat kernel), freeze
    when the shift < 1e-3 * bandwidth, stop at max_iter;
  * drop seeds with no points in range; deduplicate converged seeds sorted by
    within-bandwidth population, greedily suppressing others within
    bandwidth;
  * assign every point to the nearest surviving center (cluster_all=True).

Bins in E-dim space are keyed by a deterministic prime-mix hash (collisions
merely merge two initial seeds, harmless for convergence).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array(
    [73856093, 19349669, 83492791, 49979693, 86028157, 32452867, 67867967, 2654435761],
    dtype=np.uint32,
)


class MeanShiftResult(NamedTuple):
    labels: jnp.ndarray  # [B, Np] int32 cluster id per point (-1 invalid)
    centers: jnp.ndarray  # [B, S, E]
    center_valid: jnp.ndarray  # [B, S] bool
    num_clusters: jnp.ndarray  # [B] int32


def _bin_seeds(x: jnp.ndarray, valid: jnp.ndarray, bandwidth: float, s: int):
    """Top-s occupied bins (by count); returns (seeds [s, E], seed_valid [s])."""
    np_, e = x.shape
    bins = jnp.round(x / bandwidth).astype(jnp.int32)
    primes = jnp.asarray(_PRIMES[:e])
    h = jnp.sum(bins.astype(jnp.uint32) * primes[None, :], axis=-1)
    h = jnp.where(valid, h, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(h)
    sh = h[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sh[1:] != sh[:-1]])
    first = first & (sh != jnp.uint32(0xFFFFFFFF))
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(sh != jnp.uint32(0xFFFFFFFF), run_id, -1)
    counts = jax.ops.segment_sum(
        jnp.ones((np_,), jnp.int32), seg, num_segments=np_
    )
    score = jnp.where(first, jnp.take(counts, jnp.maximum(run_id, 0)), -1)
    top_score, top_pos = jax.lax.top_k(score, min(s, np_))
    rep_rows = jnp.take(order, top_pos)  # original rows of representatives
    seeds = jnp.round(jnp.take(x, rep_rows, axis=0) / bandwidth) * bandwidth
    seed_valid = top_score > 0
    if s > np_:
        seeds = jnp.pad(seeds, ((0, s - np_), (0, 0)))
        seed_valid = jnp.pad(seed_valid, (0, s - np_))
    return seeds, seed_valid


def _shift_iter(seeds, frozen, x, pvalid, bw2):
    d2 = (
        jnp.sum(seeds * seeds, axis=-1, keepdims=True)
        + jnp.sum(x * x, axis=-1)[None, :]
        - 2.0 * seeds @ x.T
    )
    within = (d2 <= bw2) & pvalid[None, :]
    w = within.astype(jnp.float32)
    cnt = jnp.sum(w, axis=1)
    new = (w @ x) / jnp.maximum(cnt, 1.0)[:, None]
    new = jnp.where((cnt > 0)[:, None], new, seeds)
    return new, cnt


def _mean_shift_single(
    x: jnp.ndarray,
    pvalid: jnp.ndarray,
    bandwidth: float,
    max_seeds: int,
    max_iter: int,
):
    """One sample. x: [Np, E], pvalid: [Np]."""
    e = x.shape[1]
    bw2 = bandwidth * bandwidth
    tol = 1e-3 * bandwidth
    seeds0, svalid = _bin_seeds(x, pvalid, bandwidth, max_seeds)
    # Pallas streaming kernel for the flat-kernel update: avoids the [S, Np]
    # HBM matrix; measured bit-exact and ~13% faster than the XLA form on v5e
    # (S=128, Np=16k). Default on; PST_PALLAS_MEANSHIFT=0 disables. On CPU it
    # runs in interpret mode, so the XLA form is used there instead.
    use_pallas = os.environ.get("PST_PALLAS_MEANSHIFT", "1") != "0" and (
        jax.default_backend() != "cpu"
    )
    if use_pallas:
        from .pallas_meanshift import meanshift_update

    def cond(st):
        seeds, frozen, it = st
        return (it < max_iter) & jnp.any(svalid & ~frozen)

    def body(st):
        seeds, frozen, it = st
        if use_pallas:
            new, cnt = meanshift_update(seeds, x, pvalid, bandwidth)
        else:
            new, cnt = _shift_iter(seeds, frozen, x, pvalid, bw2)
        shift2 = jnp.sum((new - seeds) ** 2, axis=-1)
        newly_frozen = shift2 < tol * tol
        upd = jnp.where((~frozen & svalid)[:, None], new, seeds)
        return upd, frozen | newly_frozen | ~svalid, it + 1

    seeds, _, _ = jax.lax.while_loop(
        cond, body, (seeds0, jnp.zeros(seeds0.shape[0], bool), jnp.int32(0))
    )
    # final populations
    _, cnt = _shift_iter(seeds, None, x, pvalid, bw2)
    alive = svalid & (cnt >= 1)

    # dedup: sort by population desc, greedy suppression within bandwidth
    s = seeds.shape[0]
    order = jnp.argsort(-jnp.where(alive, cnt, -1.0))
    d2_ss = (
        jnp.sum(seeds * seeds, axis=-1, keepdims=True)
        + jnp.sum(seeds * seeds, axis=-1)[None, :]
        - 2.0 * seeds @ seeds.T
    )
    near = d2_ss <= bw2  # [S, S]

    def dedup_body(t, st):
        keep, suppressed = st
        i = order[t]
        active = alive[i] & ~suppressed[i]
        keep = keep.at[i].set(active)
        suppressed = suppressed | (active & near[i])
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0, s, dedup_body, (jnp.zeros(s, bool), jnp.zeros(s, bool))
    )

    # compact kept centers (ordered by population) and assign points
    kept_rank_of_order = jnp.cumsum(jnp.take(keep, order).astype(jnp.int32)) - 1
    centers = jnp.zeros((s, e), x.dtype)
    tgt = jnp.where(jnp.take(keep, order), kept_rank_of_order, s)
    centers = centers.at[tgt].set(jnp.take(seeds, order, axis=0), mode="drop")
    n_centers = jnp.sum(keep.astype(jnp.int32))
    center_valid = jnp.arange(s) < n_centers

    d2_pc = (
        jnp.sum(x * x, axis=-1, keepdims=True)
        + jnp.sum(centers * centers, axis=-1)[None, :]
        - 2.0 * x @ centers.T
    )  # [Np, S]
    d2_pc = jnp.where(center_valid[None, :], d2_pc, jnp.inf)
    labels = jnp.argmin(d2_pc, axis=-1).astype(jnp.int32)
    labels = jnp.where(pvalid & (n_centers > 0), labels, -1)
    return labels, centers, center_valid, n_centers


@partial(jax.jit, static_argnames=("bandwidth", "max_seeds", "max_iter"))
def mean_shift(
    x: jnp.ndarray,
    valid: jnp.ndarray,
    bandwidth: float,
    max_seeds: int = 256,
    max_iter: int = 100,
) -> MeanShiftResult:
    """Batched mean-shift. x: [B, Np, E], valid: [B, Np]."""
    labels, centers, cvalid, ncl = jax.vmap(
        lambda xs, vs: _mean_shift_single(xs, vs, bandwidth, max_seeds, max_iter)
    )(x, valid)
    return MeanShiftResult(labels, centers, cvalid, ncl)


def pack_by_sample(
    x: jnp.ndarray,
    batch: jnp.ndarray,
    mask: jnp.ndarray,
    num_samples: int,
    cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pack masked flat rows into [B, cap] dense per-sample tensors.

    Returns (dense [B, cap, E], dvalid [B, cap], src_row [B, cap] int32 -1 pad,
    dropped [] int32). ``dropped`` counts masked rows beyond ``cap`` in their
    sample - the reference clusters every thing point
    (``/root/reference/torch_points3d/utils/meanshift_cluster.py:72-123``), so
    a nonzero count means the cap must be raised; callers surface it as
    ``cluster_overflow`` next to the scorer/hierarchy overflow counters.
    """
    n = x.shape[0]
    key = jnp.where(mask, batch, num_samples)
    order = jnp.argsort(key, stable=True)
    sb = jnp.take(key, order)
    start = jnp.searchsorted(sb, jnp.arange(num_samples), side="left").astype(jnp.int32)
    slot = jnp.arange(n, dtype=jnp.int32) - jnp.take(start, jnp.minimum(sb, num_samples - 1))
    ok = (sb < num_samples) & (slot < cap)
    flat_tgt = jnp.where(ok, sb * cap + slot, num_samples * cap)
    dense = jnp.zeros((num_samples * cap, x.shape[1]), x.dtype)
    dense = dense.at[flat_tgt].set(jnp.take(x, order, axis=0), mode="drop")
    dvalid = jnp.zeros((num_samples * cap,), bool).at[flat_tgt].set(ok, mode="drop")
    src = jnp.full((num_samples * cap,), -1, jnp.int32)
    src = src.at[flat_tgt].set(order, mode="drop")
    e = x.shape[1]
    dropped = jnp.sum(((sb < num_samples) & (slot >= cap)).astype(jnp.int32))
    return (
        dense.reshape(num_samples, cap, e),
        dvalid.reshape(num_samples, cap),
        src.reshape(num_samples, cap),
        dropped,
    )
