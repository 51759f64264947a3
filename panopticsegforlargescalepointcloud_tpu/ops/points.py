"""Point-sampling / neighbor device ops: FPS, kNN, ball query, kNN-interpolate.

TPU-native equivalents of the torch-points-kernels CUDA ops the reference's
point-based backbones consume (``furthest_point_sample``/``knn``/``ball_query``
behind ``core/spatial_ops/sampling_strategies.py`` and
``neighbour_finder.py``, and torch_geometric's ``knn_interpolate`` used in
dense up-modules). The paper pipeline itself is fully sparse-conv based -
these exist for the API surface (samplers, interpolators) and any
point-MLP-style model built on it.

Design: fixed shapes throughout. kNN/ball query are brute-force masked
[Q, R] distance matrices - the MXU eats the ``-2 q·rᵀ`` GEMM, and legacy
backbones query a few thousand centroids against tile-sized clouds, so the
O(QR) matrix is the fast, compile-friendly choice on TPU (the grid-hash path
in :mod:`..cluster.neighbors` covers the self-query radius case at full tile
sizes). FPS is the standard iterative max-min scan inside a ``fori_loop``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_dist2(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    qvalid: jnp.ndarray | None = None,
    rvalid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Masked squared distances [Q, R]; invalid pairs become +inf."""
    q2 = jnp.sum(query * query, axis=1)[:, None]
    r2 = jnp.sum(ref * ref, axis=1)[None, :]
    d2 = q2 + r2 - 2.0 * query @ ref.T
    d2 = jnp.maximum(d2, 0.0)
    if rvalid is not None:
        d2 = jnp.where(rvalid[None, :], d2, jnp.inf)
    if qvalid is not None:
        d2 = jnp.where(qvalid[:, None], d2, jnp.inf)
    return d2


def knn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    qvalid: jnp.ndarray | None = None,
    rvalid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest reference rows per query (brute force).

    Returns (idx [Q, k] int32 with -1 where fewer than k valid refs,
    dist2 [Q, k] f32 with +inf padding), nearest first.
    """
    d2 = pairwise_dist2(query, ref, qvalid, rvalid)
    neg, idx = jax.lax.top_k(-d2, min(k, ref.shape[0]))
    dist2 = -neg
    idx = jnp.where(jnp.isfinite(dist2), idx, -1)
    if idx.shape[1] < k:
        pad = k - idx.shape[1]
        idx = jnp.concatenate(
            [idx, jnp.full((idx.shape[0], pad), -1, jnp.int32)], axis=1
        )
        dist2 = jnp.concatenate(
            [dist2, jnp.full((dist2.shape[0], pad), jnp.inf, dist2.dtype)],
            axis=1,
        )
    return idx.astype(jnp.int32), dist2


def ball_query(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    radius: float,
    k: int,
    qvalid: jnp.ndarray | None = None,
    rvalid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up to ``k`` reference rows within ``radius`` per query (nearest-first;
    the reference CUDA op returns scan order, but every consumer treats the
    set as unordered). -1 / +inf padding."""
    idx, dist2 = knn(query, ref, k, qvalid, rvalid)
    ok = dist2 <= radius * radius
    return jnp.where(ok, idx, -1), jnp.where(ok, dist2, jnp.inf)


def farthest_point_sample(
    pos: jnp.ndarray,
    num_samples: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Iterative farthest-point sampling (torch-points-kernels
    ``furthest_point_sample`` semantics: start from row 0, greedily add the
    point maximizing the distance to the selected set).

    Returns [num_samples] int32 row indices; when fewer than ``num_samples``
    valid rows exist, indices repeat (matching the reference's behavior of
    sampling with replacement from the exhausted set).
    """
    n = pos.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    start = jnp.argmax(valid)  # first valid row (row 0 when all valid)
    mind2 = jnp.where(
        valid, jnp.sum((pos - pos[start]) ** 2, axis=1), -jnp.inf
    )

    def body(i, state):
        sel, mind2 = state
        nxt = jnp.argmax(mind2).astype(jnp.int32)
        sel = sel.at[i].set(nxt)
        d2 = jnp.sum((pos - pos[nxt]) ** 2, axis=1)
        mind2 = jnp.where(valid, jnp.minimum(mind2, d2), -jnp.inf)
        return sel, mind2

    sel0 = jnp.full((num_samples,), start, jnp.int32)
    sel, _ = jax.lax.fori_loop(1, num_samples, body, (sel0, mind2))
    return sel


def knn_interpolate(
    feats: jnp.ndarray,
    src_pos: jnp.ndarray,
    dst_pos: jnp.ndarray,
    k: int = 3,
    src_valid: jnp.ndarray | None = None,
    dst_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inverse-distance-weighted feature upsampling (torch_geometric
    ``knn_interpolate`` semantics, used by the reference's dense up modules):
    each destination point averages its k nearest source features with
    weights 1/d2 (clamped)."""
    idx, d2 = knn(dst_pos, src_pos, k, dst_valid, src_valid)
    w = jnp.where(idx >= 0, 1.0 / jnp.maximum(d2, 1e-16), 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-16)
    g = jnp.take(feats, jnp.maximum(idx, 0), axis=0)  # [D, k, C]
    out = jnp.sum(g * w[:, :, None].astype(feats.dtype), axis=1)
    if dst_valid is not None:
        out = jnp.where(dst_valid[:, None], out, 0)
    return out
