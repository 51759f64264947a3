"""Brick-dense submanifold convolution - the TPU-shaped sparse conv.

Random per-row gathers (64-128 B each) run ~50x below HBM bandwidth on TPU
and dominated the conv stage. This module re-tiles each level into dense
``bs x bs x bs`` bricks so a stride-1 (submanifold) conv becomes:

  rows -> scatter into [NB, bs^3, C] dense bricks (contiguous)
       -> gather 27 *whole neighbor bricks* (2-14 KB contiguous DMAs)
       -> assemble a (bs+2)^3 halo tensor
       -> ONE dense 3x3x3 ``lax.conv`` over [NB, bs+2, bs+2, bs+2, C] (MXU)
       -> gather occupied voxels back to rows.

Exactness: empty slots hold zero features, so they contribute exactly what a
missing neighbor contributes in the gather formulation (nothing); outputs are
read only at occupied voxels. brick_conv == sparse_conv(same_level_map) to
fp32 accumulation order (asserted in tests).

The brick structure (voxel->brick row/slot, brick neighbor map) is built once
per level and shared by every stride-1 conv there, replacing the voxel-level
same-map lookups (13 x N queries) with brick-level ones (13 x N/occ queries).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .hashing import BitLayout, DEFAULT_BITS, INVALID_KEY, lookup, pack_coords
from .sparse import KERNEL_OFFSETS_K3, SparseGrid, same_level_map


@flax.struct.dataclass
class BrickLevel:
    """Brick tiling of one grid level (static geometry fields stay python
    ints across jit boundaries via pytree_node=False).

    Attributes:
      brick_row: [N] int32 voxel row -> brick index (-1 for padding/overflow).
      slot: [N] int32 voxel row -> slot in its brick (x*bs^2 + y*bs + z).
      nbr: [NB, 27] int32 brick-level neighbor map (-1 absent).
      overflow: [] int32 voxels dropped by the brick capacity.
      num_bricks: static brick capacity NB.
      brick_size: static bs.
    """

    brick_row: jnp.ndarray
    slot: jnp.ndarray
    nbr: jnp.ndarray
    overflow: jnp.ndarray
    num_bricks: int = flax.struct.field(pytree_node=False)
    brick_size: int = flax.struct.field(pytree_node=False)


def build_brick_level(
    grid: SparseGrid,
    num_bricks: int,
    brick_size: int = 4,
    bits: BitLayout = DEFAULT_BITS,
) -> BrickLevel:
    bs = brick_size
    bcoords = jnp.floor_divide(grid.coords, bs)
    local = grid.coords - bcoords * bs
    slot = (local[:, 0] * bs + local[:, 1]) * bs + local[:, 2]

    keys = pack_coords(grid.batch, bcoords, bits, extra_invalid=jnp.logical_not(grid.mask))
    order = jnp.argsort(keys)
    skeys = jnp.take(keys, order)
    first = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    first = first & (skeys != INVALID_KEY)
    uidx = jnp.cumsum(first.astype(jnp.int32)) - 1
    nb = num_bricks
    tgt = jnp.where(first & (uidx < nb), uidx, nb)
    bkeys = jnp.full((nb,), INVALID_KEY, jnp.uint32).at[tgt].set(skeys, mode="drop")
    bbatch = jnp.full((nb,), -1, jnp.int32).at[tgt].set(
        jnp.take(grid.batch, order), mode="drop"
    )
    bc = jnp.zeros((nb, 3), jnp.int32).at[tgt].set(
        jnp.take(bcoords, order, axis=0), mode="drop"
    )
    n = grid.capacity
    row_sorted = jnp.where((skeys != INVALID_KEY) & (uidx < nb), uidx, -1)
    brick_row = jnp.zeros((n,), jnp.int32).at[order].set(row_sorted)
    overflow = jnp.sum(((skeys != INVALID_KEY) & (uidx >= nb)).astype(jnp.int32))

    bgrid = SparseGrid(bc, bbatch, bkeys, bkeys != INVALID_KEY)
    nbr = same_level_map(bgrid, KERNEL_OFFSETS_K3, bits)
    return BrickLevel(
        brick_row=jnp.where(grid.mask, brick_row, -1),
        slot=slot,
        nbr=nbr,
        overflow=overflow,
        num_bricks=nb,
        brick_size=bs,
    )


def _halo_ranges(bs: int):
    """Per-axis (halo_start, halo_len, src_start) for offsets -1, 0, +1 with a
    1-voxel halo: offset -1 contributes its last plane, +1 its first."""
    return {-1: (0, 1, bs - 1), 0: (1, bs, 0), 1: (bs + 1, 1, 0)}


def brick_conv(
    feats: jnp.ndarray,
    level: BrickLevel,
    weights: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Submanifold 3x3x3 conv via dense bricks. weights: [27, Cin, Cout] in the
    z-fastest lexicographic offset order (== KERNEL_OFFSETS_K3)."""
    n, cin = feats.shape
    k, wcin, cout = weights.shape
    assert k == 27 and wcin == cin
    bs = level.brick_size
    vol = bs ** 3
    nb = level.num_bricks

    cdt = jnp.dtype(compute_dtype)
    x = feats.astype(cdt)
    dense = jnp.zeros(((nb + 1) * vol, cin), cdt)
    tgt = jnp.where(level.brick_row >= 0, level.brick_row * vol + level.slot, (nb + 1) * vol)
    dense = dense.at[tgt].set(x, mode="drop")
    dense = dense.reshape(nb + 1, vol, cin)

    # halo assembly: 27 whole-brick gathers + static slab placement
    h = bs + 2
    halo = jnp.zeros((nb, h, h, h, cin), cdt)
    safe_nbr = jnp.where(level.nbr >= 0, level.nbr, nb)  # nb = zero brick
    rng = _halo_ranges(bs)
    for kk, (ox, oy, oz) in enumerate(np.asarray(KERNEL_OFFSETS_K3)):
        nbf = jnp.take(dense, safe_nbr[:, kk], axis=0)  # [NB, vol, Cin]
        nbf = nbf.reshape(nb, bs, bs, bs, cin)
        hx, lx, sx = rng[int(ox)]
        hy, ly, sy = rng[int(oy)]
        hz, lz, sz = rng[int(oz)]
        halo = jax.lax.dynamic_update_slice(
            halo,
            jax.lax.slice(
                nbf, (0, sx, sy, sz, 0), (nb, sx + lx, sy + ly, sz + lz, cin)
            ),
            (0, hx, hy, hz, 0),
        )

    w = weights.astype(cdt).reshape(3, 3, 3, cin, cout)
    # No preferred_element_type: its f32 output makes the conv VJP mix f32
    # cotangents with bf16 operands (TypeError). XLA still accumulates the
    # MXU contraction in fp32 internally; only the stored result is cdt.
    out = jax.lax.conv_general_dilated(
        halo,
        w,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # [NB, bs, bs, bs, Cout] in cdt

    out = out.reshape(nb * vol, cout)
    src = jnp.where(
        level.brick_row >= 0, level.brick_row * vol + level.slot, 0
    )
    rows = jnp.take(out, src, axis=0)
    rows = jnp.where((level.brick_row >= 0)[:, None], rows, 0.0)
    return rows.astype(out_dtype)
