"""Sparse 3D UNet / Encoder backbones built from YAML channel plans.

Structural equivalent of the reference's MinkowskiUnet / MinkowskiEncoder
(``/root/reference/torch_points3d/applications/minkowski.py:129-196``) and the
channel plans in ``conf/models/panoptic/*.yaml`` (paper backbone: 7 ResNetDown
levels, strides [1,2,2,2,2,2,2], N=2 ResBlocks, then 7 ResNetUp with skip
concatenation; see SURVEY.md §2.5).

Skip wiring (minkowski.py:159-196): every down output except the last is
pushed; ups pop in reverse - the first up gets no skip; ResNetUp concatenates
the skip at the *coarse* level before the transpose conv.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.hierarchy import Hierarchy
from ..ops.scatter import segment_max
from ..ops.winconv import unpack_feats
from .modules import PointMLP, ResNetDown, ResNetUp


class SparseUNet(nn.Module):
    """UNet over a prebuilt hierarchy.

    down_channels[i] = (cin, cout) for down module i; down_strides[i] in {1,2}.
    up_channels / up_strides likewise; the number of stride-2 down transitions
    must equal the hierarchy's depth and the number of stride-2 ups.
    """

    down_channels: Tuple[Tuple[int, int], ...]
    up_channels: Tuple[Tuple[int, int], ...]
    down_strides: Tuple[int, ...]
    up_strides: Tuple[int, ...]
    num_blocks: int = 2
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"
    # keep activations lane-packed between windowed convs (ops/winconv.Packed;
    # removes the (8,128) tile-padded f32 write + repack read per conv that
    # dominated the trunk wall - see models/modules.py docstring)
    packed_io: bool = True
    # rematerialize each down/up module in the backward pass: activations on
    # TPU pay an 8x HBM tile-padding tax at C=16 ((8,128) lanes), so saving
    # every conv's output OOMs the full train step at paper batch sizes;
    # recomputing a level's convs is cheap (gather-bound, not FLOP-bound)
    remat: bool = False

    @property
    def output_nc(self) -> int:
        return self.up_channels[-1][1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, hier: Hierarchy, train: bool, momentum=0.1):
        # static_argnums counts self at 0; `train` is a python bool
        Down = (
            nn.remat(ResNetDown, static_argnums=(5,)) if self.remat else ResNetDown
        )
        Up = nn.remat(ResNetUp, static_argnums=(6,)) if self.remat else ResNetUp
        level = 0
        skips = []
        n_down = len(self.down_channels)
        for i, (nn_ch, s) in enumerate(zip(self.down_channels, self.down_strides)):
            if s == 1:
                conv_ctx = hier.bricks[level]
                conv_ctx_t = None  # submanifold: its own transpose (modules.py)
                out_level = level
            else:
                conv_ctx = hier.down_maps[level]
                conv_ctx_t = hier.up_maps[level]  # transpose partner
                out_level = level + 1
            h = Down(
                conv_nn=nn_ch,
                stride=s,
                num_blocks=self.num_blocks,
                gemm_mode=self.gemm_mode,
                compute_dtype=self.compute_dtype,
                packed_io=self.packed_io,
                name=f"down_{i}",
            )(
                x,
                conv_ctx,
                hier.bricks[out_level],
                hier.grids[out_level].mask,
                train,
                momentum,
                conv_ctx_t,
            )
            level = out_level
            x = h
            if i < n_down - 1:
                skips.append((h, level))
        skips.append((None, level))

        for i, (nn_ch, s) in enumerate(zip(self.up_channels, self.up_strides)):
            skip, skip_level = skips.pop()
            assert skip_level == level, (
                f"up module {i}: skip level {skip_level} != current level {level}"
            )
            if s == 1:
                conv_ctx = hier.bricks[level]
                conv_ctx_t = None
                out_level = level
            else:
                conv_ctx = hier.up_maps[level - 1]
                conv_ctx_t = hier.down_maps[level - 1]  # transpose partner
                out_level = level - 1
            x = Up(
                conv_nn=nn_ch,
                stride=s,
                num_blocks=self.num_blocks,
                gemm_mode=self.gemm_mode,
                compute_dtype=self.compute_dtype,
                packed_io=self.packed_io,
                name=f"up_{i}",
            )(
                x,
                skip,
                conv_ctx,
                hier.bricks[out_level],
                hier.grids[out_level].mask,
                train,
                momentum,
                conv_ctx_t,
            )
            level = out_level
        assert level == 0, f"UNet did not return to level 0 (at {level})"
        return unpack_feats(x)


class SparseEncoder(nn.Module):
    """Encoder: stride-2 ResNetDowns then a global max-pool + MLP head
    (reference ScorerEncoder: downs + GlobalBaseModule(aggr=max),
    ``core/base_conv/message_passing.py:132-151``).

    Returns one feature row per batch sample: [num_segments, C].
    """

    down_channels: Tuple[Tuple[int, int], ...]
    down_strides: Tuple[int, ...]
    global_nn: Tuple[int, ...]  # e.g. (in_feat,) output channels of global MLP
    num_segments: int
    num_blocks: int = 2
    gemm_mode: str = "fused"
    compute_dtype: str = "float32"
    packed_io: bool = True  # see SparseUNet.packed_io
    remat: bool = False  # see SparseUNet.remat

    @property
    def output_nc(self) -> int:
        return self.global_nn[-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, hier: Hierarchy, train: bool, momentum=0.1):
        Down = (
            nn.remat(ResNetDown, static_argnums=(5,)) if self.remat else ResNetDown
        )
        level = 0
        for i, (nn_ch, s) in enumerate(zip(self.down_channels, self.down_strides)):
            if s == 1:
                conv_ctx, conv_ctx_t, out_level = hier.bricks[level], None, level
            else:
                conv_ctx = hier.down_maps[level]
                conv_ctx_t = hier.up_maps[level]
                out_level = level + 1
            x = Down(
                conv_nn=nn_ch,
                stride=s,
                num_blocks=self.num_blocks,
                gemm_mode=self.gemm_mode,
                compute_dtype=self.compute_dtype,
                packed_io=self.packed_io,
                name=f"down_{i}",
            )(
                x,
                conv_ctx,
                hier.bricks[out_level],
                hier.grids[out_level].mask,
                train,
                momentum,
                conv_ctx_t,
            )
            level = out_level
        grid = hier.grids[level]
        x = PointMLP(self.global_nn)(unpack_feats(x), grid.mask, train, momentum)
        seg = jnp.where(grid.mask, grid.batch, -1)
        return segment_max(x, seg, self.num_segments, fill=0.0)
