"""Sparse convolution apply: gather -> GEMM -> (masked) accumulate.

TPU-native replacement for MinkowskiEngine's gather-GEMM-scatter convolution
(the CUDA core behind ``ME.MinkowskiConvolution`` used everywhere in the
reference backbone, ``/root/reference/torch_points3d/modules/MinkowskiEngine/
api_modules.py:235-311``).

Two execution strategies, both pure XLA (autodiff-friendly; XLA lowers the
gathers to efficient dynamic-gathers and the backward pass to scatter-adds):

* ``mode="fused"``: materialize the gathered neighborhood tensor [N, K*Cin]
  and run ONE large matmul against the flattened weights [K*Cin, Cout]. Best
  MXU utilization (contraction dim K*Cin = 108..3024 vs 16..112), at the cost
  of a K-times-larger activation. Preferred on TPU for the UNet's sizes.
* ``mode="loop"``: K small matmuls accumulated in fp32. K-times less live
  memory; useful for very large N or ablation.

Weights layout: [K, Cin, Cout] with K indexing kernel offsets in the fixed
order of ``ops.sparse._kernel_offsets`` (z-fastest lexicographic).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _apply(feats, idx_z, weights, mode, acc_dtype):
    """Shared conv body: zero-pad-row gathers + GEMMs. ``idx_z`` must already
    map absent neighbors to row ``feats.shape[0]`` (the appended zero row)."""
    n_out, k = idx_z.shape
    cin = feats.shape[1]
    cout = weights.shape[2]
    compute_dtype = feats.dtype
    fz = jnp.concatenate(
        [feats, jnp.zeros((1, cin), compute_dtype)], axis=0
    )
    if mode == "fused":
        g = jnp.take(fz, idx_z, axis=0)  # [N_out, K, Cin]
        return jnp.dot(
            g.reshape(n_out, k * cin),
            weights.astype(compute_dtype).reshape(k * cin, cout),
            preferred_element_type=acc_dtype,
        )
    out = jnp.zeros((n_out, cout), dtype=acc_dtype)
    for kk in range(k):
        gk = jnp.take(fz, idx_z[:, kk], axis=0)
        out = out + jnp.dot(
            gk, weights[kk].astype(compute_dtype), preferred_element_type=acc_dtype
        )
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _conv_tm(feats, weights, idx_z, idx_t_z, mode):
    acc = jnp.promote_types(feats.dtype, jnp.float32)
    return _apply(feats, idx_z, weights, mode, acc)


def _conv_tm_fwd(feats, weights, idx_z, idx_t_z, mode):
    return _conv_tm(feats, weights, idx_z, idx_t_z, mode), (
        feats, weights, idx_z, idx_t_z,
    )


def _conv_tm_bwd(mode, res, g):
    """Backward through the TRANSPOSE kernel map: XLA's native VJP of the
    gather is a scatter-add, which profiled 7x slower than the equivalent
    gather form on v5e (46 vs 6.4 ms at [131k,16], scripts/bench_convbn.py).
    With idx_t satisfying ``idx_t[j, K-1-k] = i  <=>  idx[i, k] = j`` (true
    for submanifold maps against themselves and for down/up map pairs), the
    feats cotangent is just another conv: gf[j] = sum_k' g[idx_t[j,k']] @
    W[K-1-k']^T."""
    feats, weights, idx_z, idx_t_z = res
    cdt = feats.dtype
    acc = jnp.promote_types(cdt, jnp.float32)
    gq = g.astype(cdt)
    w_t = jnp.flip(weights, axis=0).transpose(0, 2, 1)
    gf = _apply(gq, idx_t_z, w_t, mode, acc).astype(cdt)
    # grad weights: per-offset gathered-input^T @ g ([Cin, N] x [N, Cout])
    n_in, cin = feats.shape
    k = idx_z.shape[1]
    fz = jnp.concatenate([feats, jnp.zeros((1, cin), cdt)], axis=0)
    gws = []
    for kk in range(k):
        fk = jnp.take(fz, idx_z[:, kk], axis=0)  # [N_out, Cin]
        gws.append(jnp.dot(fk.T, gq, preferred_element_type=acc))
    gw = jnp.stack(gws).astype(weights.dtype)
    return gf, gw, None, None


_conv_tm.defvjp(_conv_tm_fwd, _conv_tm_bwd)


def sparse_conv(
    feats: jnp.ndarray,
    nbr_idx: jnp.ndarray,
    weights: jnp.ndarray,
    mode: str = "fused",
    out_dtype: jnp.dtype | None = None,
    nbr_idx_t: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Apply a sparse convolution through a kernel map.

    Args:
      feats: [N_in, Cin] input voxel features (padding rows must be zero or
        will be masked out via the -1 indices anyway).
      nbr_idx: [N_out, K] int32 gather map into ``feats`` rows, -1 = absent.
      weights: [K, Cin, Cout].
      mode: "fused" (one big GEMM), "loop" (K GEMMs; faster on v5e, slower to
        compile), or "auto" (loop on TPU, fused elsewhere).
      out_dtype: accumulation/output dtype (default: feats.dtype promoted to
        at least float32 for accumulation, cast back to feats.dtype).
      nbr_idx_t: optional transpose kernel map ([N_in, K] int32) satisfying
        ``nbr_idx_t[j, K-1-k] = i  <=>  nbr_idx[i, k] = j`` - the submanifold
        map itself, or the partner of a down/up map pair. When given, the
        backward pass runs as a conv through it (all gathers) instead of
        XLA's scatter-add gather-VJP (7x slower on v5e).

    Returns:
      [N_out, Cout] output features (padding rows are zero because all their
      indices are -1).
    """
    n_out, k = nbr_idx.shape
    kw, cin, cout = weights.shape
    assert kw == k, f"kernel map K={k} != weights K={kw}"
    if mode == "auto":
        import jax as _jax

        # loop wins for big row counts (gather cost is per-row; skipping the
        # [N,27,C] materialization dominates); below ~16k rows its 27 separate
        # gather+GEMM ops are dispatch-overhead-bound and fused wins. CPU
        # always takes fused (loop compiles ~6x slower).
        big = n_out >= 16384
        mode = "loop" if (big and _jax.default_backend() == "tpu") else "fused"
    if mode not in ("fused", "loop"):
        raise ValueError(f"unknown sparse_conv mode: {mode}")
    compute_dtype = feats.dtype
    acc_dtype = jnp.promote_types(compute_dtype, jnp.float32)
    # Absent neighbors gather a zero pad row instead of being where()-masked:
    # one [1, Cin] concat replaces a per-offset [N, Cin] select pass
    # (scripts/bench_convbn.py: ~20% of loop-conv time on v5e at 10% invalid;
    # real kernel maps are sparser still).
    n_in = feats.shape[0]
    idx = jnp.where(nbr_idx >= 0, nbr_idx, n_in)
    w = weights.astype(compute_dtype)

    if nbr_idx_t is not None:
        idx_t = jnp.where(nbr_idx_t >= 0, nbr_idx_t, n_out)
        out = _conv_tm(feats, w, idx, idx_t, mode)
    else:
        out = _apply(feats, idx, w, mode, acc_dtype)

    if out_dtype is None:
        out_dtype = compute_dtype
    return out.astype(out_dtype)
