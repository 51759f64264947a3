"""Flax building blocks for the sparse 3D UNet backbone.

Structural equivalents (not translations) of the reference's MinkowskiEngine
blocks (``/root/reference/torch_points3d/modules/MinkowskiEngine/
api_modules.py``: ResBlock 9-82, ResNetDown 235-285, ResNetUp 288-311) and
the point-wise ``MLP`` helper (``core/common_modules/base_modules.py:35-45``:
Linear -> BatchNorm -> LeakyReLU(0.2) per layer).

Every module operates on padded [N, C] voxel features plus a valid mask, and
receives pre-built kernel maps from :mod:`..ops.hierarchy` - so the module
tree is pure compute, shared topology.

Init mirrors the reference: kaiming-normal fan_out for conv kernels
(``applications/minkowski.py:105-111``), BN gamma=1 beta=0.
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

# Measurement A/B only (repo convention: PST_* env knobs are bench overrides,
# never the product path): PST_CONV_OUT_BF16 emits conv outputs in bf16
# instead of f32 to halve inter-conv HBM traffic (BN still computes in f32
# internally); PST_SKIP_BN drops the BN between convs entirely (numerics
# change - timing attribution only).
_AB_OUT_BF16 = bool(os.environ.get("PST_CONV_OUT_BF16"))
_AB_SKIP_BN = bool(os.environ.get("PST_SKIP_BN"))

from ..ops.brick import BrickLevel, brick_conv
from ..ops.conv import sparse_conv
from ..ops.winconv import WindowedMap, windowed_conv
from .norm import MaskedBatchNorm

# kaiming_normal with fan_out over the (K * Cin, Cout) matrix: variance
# scaling w/ scale=2 (relu), fan_out, normal.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class SparseConv(nn.Module):
    """A single sparse convolution through a kernel map. Weights [K, Cin, Cout].

    ``compute_dtype`` controls the gather/GEMM precision (bfloat16 halves the
    dominant HBM gather traffic on TPU; accumulation stays fp32 via
    preferred_element_type and the output is cast back to fp32)."""

    features: int
    kernel_volume: int = 27
    use_bias: bool = False
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, ctx, ctx_t=None, train: bool = False) -> jnp.ndarray:
        """``ctx`` is a [N, K] row kernel map, a WindowedMap (Pallas
        windowed-streaming kernel, ops/winconv.py), or a BrickLevel
        (brick-dense path). ``ctx_t`` is the transpose kernel map (the map
        itself for submanifold convs, the down/up partner for strided ones) -
        routes the backward pass through gathers instead of scatter-adds.

        The windowed kernel runs at ALL widths in training and eval: the
        former C>32 training anomaly (22.9 ms composite backward at C=64)
        was the old correction pass materializing [cap, C, Cout] f32
        tensors; with the in-place scatter + one-GEMM correction the C=64
        composite f+b is 0.95 ms (scripts/bench_winconv_bwd.py, v5e)."""
        cin = x.shape[-1]
        w = self.param(
            "kernel", conv_init, (self.kernel_volume, cin, self.features), jnp.float32
        )
        cdt = jnp.dtype(self.compute_dtype)
        odt = jnp.bfloat16 if (_AB_OUT_BF16 and not train) else jnp.float32
        if isinstance(ctx, BrickLevel):
            out = brick_conv(
                x, ctx, w, compute_dtype=cdt, out_dtype=odt
            )
        elif isinstance(ctx, WindowedMap):
            win_ok = ctx_t is None or isinstance(ctx_t, WindowedMap)
            if win_ok:
                out = windowed_conv(
                    x.astype(cdt), ctx, w.astype(cdt), ctx_t,
                    out_dtype=odt,
                )
            else:
                idx_t = ctx_t.idx if isinstance(ctx_t, WindowedMap) else ctx_t
                out = sparse_conv(
                    x.astype(cdt), ctx.idx, w.astype(cdt), mode=self.gemm_mode,
                    out_dtype=odt, nbr_idx_t=idx_t,
                )
        else:
            idx_t = ctx_t.idx if isinstance(ctx_t, WindowedMap) else ctx_t
            out = sparse_conv(
                x.astype(cdt), ctx, w.astype(cdt), mode=self.gemm_mode,
                out_dtype=odt, nbr_idx_t=idx_t,
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + b.astype(out.dtype)
        return out


class ConvBNReLU(nn.Module):
    features: int
    kernel_volume: int = 27
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, ctx, mask, train: bool, momentum=0.1, ctx_t=None):
        h = SparseConv(
            self.features, self.kernel_volume, gemm_mode=self.gemm_mode,
            compute_dtype=self.compute_dtype,
        )(x, ctx, ctx_t, train)
        if not _AB_SKIP_BN:
            h = MaskedBatchNorm()(h, mask, train, momentum)
        return nn.relu(h)


class ResBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN-ReLU + (identity | 1x1conv-BN) shortcut.

    Note the reference applies ReLU *before* the residual add (post-activation
    on the branch, none after the sum) - reproduced here.
    """

    features: int
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, same_ctx, mask, train: bool, momentum=0.1):
        kw = dict(gemm_mode=self.gemm_mode, compute_dtype=self.compute_dtype)
        # a submanifold map is its own transpose (umap[j, K-1-k]=i <=>
        # map[i, k]=j holds with idx_t = idx for symmetric offset sets)
        ct = same_ctx if not isinstance(same_ctx, BrickLevel) else None
        h = ConvBNReLU(self.features, **kw)(x, same_ctx, mask, train, momentum, ct)
        h = ConvBNReLU(self.features, **kw)(h, same_ctx, mask, train, momentum, ct)
        if x.shape[-1] != self.features:
            # 1x1 conv == pointwise dense (kernel volume 1, offset (0,0,0))
            sc = nn.Dense(self.features, use_bias=False, kernel_init=conv_init)(x)
            sc = MaskedBatchNorm()(sc, mask, train, momentum)
        else:
            sc = x
        return h + sc


class ResNetDown(nn.Module):
    """Strided (or submanifold) conv-BN-ReLU followed by N ResBlocks.

    conv_nn = (cin, cout). When stride > 1 the strided conv keeps cin channels
    (matching the reference's quirk at api_modules.py:251-254) and the first
    ResBlock widens to cout.
    """

    conv_nn: Sequence[int]
    stride: int = 2
    num_blocks: int = 2
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self, x, conv_ctx, same_ctx_out, mask_out, train: bool, momentum=0.1,
        conv_ctx_t=None,
    ):
        """Args:
        x: input features at the source level.
        conv_ctx: ctx for the first conv (down row-map if stride 2, else the
          output level's BrickLevel); rows index the *output* level.
        same_ctx_out: BrickLevel at the output level (for the ResBlocks).
        mask_out: valid mask at the output level.
        conv_ctx_t: transpose map of conv_ctx (the partner up/down map for
          stride-2 convs; defaults to conv_ctx itself for submanifold maps).
        """
        cin, cout = self.conv_nn
        first_out = cin if self.stride > 1 else cout
        kw = dict(gemm_mode=self.gemm_mode, compute_dtype=self.compute_dtype)
        if conv_ctx_t is None and not isinstance(conv_ctx, BrickLevel) and self.stride == 1:
            conv_ctx_t = conv_ctx
        h = ConvBNReLU(first_out, **kw)(
            x, conv_ctx, mask_out, train, momentum, conv_ctx_t
        )
        for _ in range(self.num_blocks):
            h = ResBlock(cout, **kw)(h, same_ctx_out, mask_out, train, momentum)
        return h


class ResNetUp(nn.Module):
    """Concat skip, then transpose conv-BN-ReLU + N ResBlocks (reference
    ResNetUp: cat happens at the coarse level *before* upsampling)."""

    conv_nn: Sequence[int]
    stride: int = 2
    num_blocks: int = 2
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self, x, skip, conv_ctx, same_ctx_out, mask_out, train: bool, momentum=0.1,
        conv_ctx_t=None,
    ):
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        return ResNetDown(
            conv_nn=self.conv_nn,
            stride=self.stride,
            num_blocks=self.num_blocks,
            gemm_mode=self.gemm_mode,
            compute_dtype=self.compute_dtype,
            name="up",
        )(x, conv_ctx, same_ctx_out, mask_out, train, momentum, conv_ctx_t)


class PointMLP(nn.Module):
    """Per-point MLP: [Dense -> MaskedBN -> LeakyReLU(0.2)] per layer,
    mirroring the reference MLP helper. channels excludes the input dim."""

    channels: Sequence[int]
    use_bias: bool = True
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, mask, train: bool, momentum=0.1):
        for c in self.channels:
            x = nn.Dense(c, use_bias=self.use_bias)(x)
            x = MaskedBatchNorm()(x, mask, train, momentum)
            x = nn.leaky_relu(x, self.negative_slope)
        m = mask.astype(x.dtype)[:, None]
        return x * m
