"""Flax building blocks for the sparse 3D UNet backbone.

Structural equivalents (not translations) of the reference's MinkowskiEngine
blocks (``/root/reference/torch_points3d/modules/MinkowskiEngine/
api_modules.py``: ResBlock 9-82, ResNetDown 235-285, ResNetUp 288-311) and
the point-wise ``MLP`` helper (``core/common_modules/base_modules.py:35-45``:
Linear -> BatchNorm -> LeakyReLU(0.2) per layer).

Every module operates on padded [N, C] voxel features plus a valid mask, and
receives pre-built kernel maps from :mod:`..ops.hierarchy` - so the module
tree is pure compute, shared topology.

Packed dataflow (``packed_io``): levels whose kernel maps run the Pallas
windowed conv keep activations LANE-PACKED between convs (ops/winconv.py
``Packed``: [n/p, p*c] with p = 128//c). A [n, c] f32 tensor at c < 128 pays
an (8, 128) tile-padding tax in HBM - 8x junk bytes at c=16 - and round 4
measured the padded write + repack read at ~1.1 ms of the ~1.44 ms per-conv
chained cost (scripts/probe_trunk_gap.py part 3). With packed_io the conv
kernel emits packed f32, BN/ReLU/residual-add operate in the packed layout,
and skip concatenation becomes a split-weight conv pair - the only remaining
per-conv HBM traffic is the unpadded activation itself. Levels that fall back
to row-gather maps transparently unpack. Numerics are unchanged (same op
order; BN batch statistics sum in a different reduction order only).

Init mirrors the reference: kaiming-normal fan_out for conv kernels
(``applications/minkowski.py:105-111``), BN gamma=1 beta=0.
"""

from __future__ import annotations

import os
import sys
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

# Measurement A/B only (repo convention: PST_* env knobs are bench overrides,
# never the product path): PST_CONV_OUT_BF16 emits conv outputs in bf16
# instead of f32 to halve inter-conv HBM traffic (BN still computes in f32
# internally); PST_SKIP_BN drops the BN between convs entirely (numerics
# change - timing attribution only). Read at CALL (trace) time, never import
# time, and warn loudly: a leftover export from a bench shell must not
# silently alter shipped model numerics (advisor r4).
_AB_WARNED: set = set()


def _ab_env(name: str) -> bool:
    val = bool(os.environ.get(name))
    if val and name not in _AB_WARNED:
        _AB_WARNED.add(name)
        print(
            f"WARNING: {name} is set - bench-only A/B override ACTIVE; "
            "model numerics differ from shipped defaults",
            file=sys.stderr,
        )
    return val

from ..ops.brick import BrickLevel, brick_conv
from ..ops.conv import sparse_conv
from ..ops.winconv import (
    Packed,
    WindowedMap,
    feat_width,
    pack_feats,
    unpack_feats,
    windowed_conv,
)
from .norm import MaskedBatchNorm

# kaiming_normal with fan_out over the (K * Cin, Cout) matrix: variance
# scaling w/ scale=2 (relu), fan_out, normal.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _unpack_concat(parts) -> jnp.ndarray:
    arrs = [unpack_feats(p) for p in parts]
    return arrs[0] if len(arrs) == 1 else jnp.concatenate(arrs, axis=-1)


def relu_any(x):
    return x.replace(data=nn.relu(x.data)) if isinstance(x, Packed) else nn.relu(x)


def match_repr(x, ref):
    """Convert ``x`` to the representation (Packed vs array) of ``ref``."""
    if isinstance(ref, Packed) and not isinstance(x, Packed):
        return pack_feats(x)
    if not isinstance(ref, Packed) and isinstance(x, Packed):
        return unpack_feats(x)
    return x


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
    out_packed: bool = False

    @nn.compact
    def __call__(self, x, ctx, ctx_t=None, train: bool = False):
        """``ctx`` is a [N, K] row kernel map, a WindowedMap (Pallas
        windowed-streaming kernel, ops/winconv.py), or a BrickLevel
        (brick-dense path). ``ctx_t`` is the transpose kernel map (the map
        itself for submanifold convs, the down/up partner for strided ones) -
        routes the backward pass through gathers instead of scatter-adds.

        ``x`` may be a [N, Cin] array, a Packed activation, or a TUPLE of
        either (implicit channel concatenation: the windowed path runs one
        conv per part against the matching Cin-slice of the shared kernel and
        sums - conv(concat(a, b), W) == conv(a, W[:, :ca]) + conv(b, W[:, ca:])
        - so skip concatenation never materializes a concatenated tensor).

        The windowed kernel runs at ALL widths in training and eval: the
        former C>32 training anomaly (22.9 ms composite backward at C=64)
        was the old correction pass materializing [cap, C, Cout] f32
        tensors; with the in-place scatter + one-GEMM correction the C=64
        composite f+b is 0.95 ms (scripts/bench_winconv_bwd.py, v5e)."""
        parts = x if isinstance(x, tuple) else (x,)
        widths = [feat_width(p) for p in parts]
        cin = sum(widths)
        w = self.param(
            "kernel", conv_init, (self.kernel_volume, cin, self.features), jnp.float32
        )
        cdt = jnp.dtype(self.compute_dtype)
        odt = (
            jnp.bfloat16
            if (_ab_env("PST_CONV_OUT_BF16") and not train)
            else jnp.float32
        )
        win_ok = isinstance(ctx, WindowedMap) and (
            ctx_t is None or isinstance(ctx_t, WindowedMap)
        )
        if isinstance(ctx, BrickLevel):
            out = brick_conv(
                _unpack_concat(parts), ctx, w, compute_dtype=cdt, out_dtype=odt
            )
        elif win_ok:
            out = None
            off = 0
            for part, cw in zip(parts, widths):
                ws = w[:, off : off + cw] if len(parts) > 1 else w
                o = windowed_conv(
                    part.astype(cdt), ctx, ws.astype(cdt), ctx_t,
                    out_dtype=odt, out_packed=self.out_packed,
                )
                out = o if out is None else out + o
                off += cw
        else:
            xx = _unpack_concat(parts)
            idx = ctx.idx if isinstance(ctx, WindowedMap) else ctx
            idx_t = ctx_t.idx if isinstance(ctx_t, WindowedMap) else ctx_t
            out = sparse_conv(
                xx.astype(cdt), idx, w.astype(cdt), mode=self.gemm_mode,
                out_dtype=odt, nbr_idx_t=idx_t,
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if isinstance(out, Packed):
                bt = jnp.tile(b, out.p)
                lanes = out.data.shape[1]
                if lanes != bt.shape[0]:
                    bt = jnp.pad(bt, (0, lanes - bt.shape[0]))
                out = out.replace(data=out.data + bt.astype(out.data.dtype))
            else:
                out = out + b.astype(out.dtype)
        return out


class PackedDense(nn.Module):
    """Pointwise (1x1-conv) dense layer that also accepts lane-packed input:
    a block-diagonal GEMM in the packed layout + an in-layout regroup, so the
    residual shortcut never materializes a tile-padded [n, c] tensor. The
    param tree matches ``nn.Dense`` ({kernel}) so the torch importer's
    ``Dense_0.kernel`` mapping (tools/import_torch_checkpoint.py) holds -
    instantiate with ``name="Dense_0"``."""

    features: int
    kernel_init: nn.initializers.Initializer = conv_init

    @nn.compact
    def __call__(self, x):
        cin = feat_width(x)
        w = self.param("kernel", self.kernel_init, (cin, self.features), jnp.float32)
        if not isinstance(x, Packed):
            return x @ w.astype(x.dtype)
        p = x.p
        lanes = x.data.shape[1]
        bd = jnp.kron(jnp.eye(p, dtype=w.dtype), w)  # [p*cin, p*cout] blockdiag
        if lanes != p * cin:
            bd = jnp.pad(bd, ((0, lanes - p * cin), (0, 0)))
        y = x.data @ bd.astype(x.data.dtype)  # [n/p, p*features]
        return pack_feats(y.reshape(x.n, self.features))


class ConvBNReLU(nn.Module):
    features: int
    kernel_volume: int = 27
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"
    packed_io: bool = False

    @nn.compact
    def __call__(self, x, ctx, mask, train: bool, momentum=0.1, ctx_t=None):
        h = SparseConv(
            self.features, self.kernel_volume, gemm_mode=self.gemm_mode,
            compute_dtype=self.compute_dtype, out_packed=self.packed_io,
        )(x, ctx, ctx_t, train)
        if not _ab_env("PST_SKIP_BN"):
            h = MaskedBatchNorm()(h, mask, train, momentum)
        return relu_any(h)


class ResBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN-ReLU + (identity | 1x1conv-BN) shortcut.

    Note the reference applies ReLU *before* the residual add (post-activation
    on the branch, none after the sum) - reproduced here.
    """

    features: int
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"
    packed_io: bool = False

    @nn.compact
    def __call__(self, x, same_ctx, mask, train: bool, momentum=0.1):
        kw = dict(
            gemm_mode=self.gemm_mode, compute_dtype=self.compute_dtype,
            packed_io=self.packed_io,
        )
        # a submanifold map is its own transpose (umap[j, K-1-k]=i <=>
        # map[i, k]=j holds with idx_t = idx for symmetric offset sets)
        ct = same_ctx if not isinstance(same_ctx, BrickLevel) else None
        h = ConvBNReLU(self.features, **kw)(x, same_ctx, mask, train, momentum, ct)
        h = ConvBNReLU(self.features, **kw)(h, same_ctx, mask, train, momentum, ct)
        if feat_width(x) != self.features:
            # 1x1 conv == pointwise dense (kernel volume 1, offset (0,0,0))
            sc = PackedDense(self.features, name="Dense_0")(x)
            sc = MaskedBatchNorm()(sc, mask, train, momentum)
        else:
            sc = x
        return h + match_repr(sc, h)


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
    packed_io: bool = False

    @nn.compact
    def __call__(
        self, x, conv_ctx, same_ctx_out, mask_out, train: bool, momentum=0.1,
        conv_ctx_t=None,
    ):
        """Args:
        x: input features at the source level (array, Packed, or a tuple of
          either - implicit concat, see SparseConv).
        conv_ctx: ctx for the first conv (down row-map if stride 2, else the
          output level's submanifold ctx); rows index the *output* level.
        same_ctx_out: submanifold ctx at the output level (for the ResBlocks).
        mask_out: valid mask at the output level.
        conv_ctx_t: transpose map of conv_ctx (the partner up/down map for
          stride-2 convs; defaults to conv_ctx itself for submanifold maps).
        """
        cin, cout = self.conv_nn
        first_out = cin if self.stride > 1 else cout
        kw = dict(
            gemm_mode=self.gemm_mode, compute_dtype=self.compute_dtype,
            packed_io=self.packed_io,
        )
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
    ResNetUp: cat happens at the coarse level *before* upsampling). The
    concat is implicit: both parts feed the transpose conv as a tuple and
    SparseConv splits the shared kernel (identical math, no concatenated
    tensor, packed layouts preserved)."""

    conv_nn: Sequence[int]
    stride: int = 2
    num_blocks: int = 2
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"
    packed_io: bool = False

    @nn.compact
    def __call__(
        self, x, skip, conv_ctx, same_ctx_out, mask_out, train: bool, momentum=0.1,
        conv_ctx_t=None,
    ):
        if skip is not None:
            x = (x, skip) if not isinstance(x, tuple) else (*x, skip)
        return ResNetDown(
            conv_nn=self.conv_nn,
            stride=self.stride,
            num_blocks=self.num_blocks,
            gemm_mode=self.gemm_mode,
            compute_dtype=self.compute_dtype,
            packed_io=self.packed_io,
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
