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

import jax.numpy as jnp


def sparse_conv(
    feats: jnp.ndarray,
    nbr_idx: jnp.ndarray,
    weights: jnp.ndarray,
    mode: str = "fused",
    out_dtype: jnp.dtype | None = None,
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

    Returns:
      [N_out, Cout] output features (padding rows are zero because all their
      indices are -1).
    """
    n_out, k = nbr_idx.shape
    kw, cin, cout = weights.shape
    assert kw == k, f"kernel map K={k} != weights K={kw}"
    if mode == "auto":
        import jax

        # loop wins for big row counts (gather cost is per-row; skipping the
        # [N,27,C] materialization dominates); below ~16k rows its 27 separate
        # gather+GEMM ops are dispatch-overhead-bound and fused wins. CPU
        # always takes fused (loop compiles ~6x slower).
        big = n_out >= 16384
        mode = "loop" if (big and jax.default_backend() == "tpu") else "fused"
    compute_dtype = feats.dtype
    acc_dtype = jnp.promote_types(compute_dtype, jnp.float32)
    # Absent neighbors gather a zero pad row instead of being where()-masked:
    # one [1, Cin] concat replaces a per-offset [N, Cin] select pass
    # (scripts/bench_convbn.py: ~20% of loop-conv time on v5e at 10% invalid;
    # real kernel maps are sparser still).
    n_in = feats.shape[0]
    fz = jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[1]), compute_dtype)], axis=0
    )
    idx = jnp.where(nbr_idx >= 0, nbr_idx, n_in)

    if mode == "fused":
        g = jnp.take(fz, idx, axis=0)  # [N_out, K, Cin]
        out = jnp.dot(
            g.reshape(n_out, k * cin),
            weights.astype(compute_dtype).reshape(k * cin, cout),
            preferred_element_type=acc_dtype,
        )
    elif mode == "loop":
        out = jnp.zeros((n_out, cout), dtype=acc_dtype)
        for kk in range(k):
            gk = jnp.take(fz, idx[:, kk], axis=0)  # [N_out, Cin]
            out = out + jnp.dot(
                gk, weights[kk].astype(compute_dtype), preferred_element_type=acc_dtype
            )
    else:
        raise ValueError(f"unknown sparse_conv mode: {mode}")

    if out_dtype is None:
        out_dtype = compute_dtype
    return out.astype(out_dtype)
