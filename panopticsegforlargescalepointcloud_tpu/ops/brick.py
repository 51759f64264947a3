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

import os

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


def _halo_tables(bs: int):
    """Static halo-cell provenance: for every cell of the (bs+2)^3 halo, the
    kernel-offset index k (which neighbor brick) and the slot inside it."""
    h = bs + 2
    cell_k = np.zeros(h ** 3, np.int32)
    cell_slot = np.zeros(h ** 3, np.int32)
    for hx in range(h):
        ox = -1 if hx == 0 else (1 if hx == h - 1 else 0)
        sx = (hx - 1) % bs
        for hy in range(h):
            oy = -1 if hy == 0 else (1 if hy == h - 1 else 0)
            sy = (hy - 1) % bs
            for hz in range(h):
                oz = -1 if hz == 0 else (1 if hz == h - 1 else 0)
                sz = (hz - 1) % bs
                c = (hx * h + hy) * h + hz
                cell_k[c] = ((ox + 1) * 3 + (oy + 1)) * 3 + (oz + 1)
                cell_slot[c] = (sx * bs + sy) * bs + sz
    return cell_k, cell_slot


def _unfold_table(bs: int):
    """out cell o (bs^3), kernel offset k (27) -> halo cell index ((bs+2)^3),
    matching the z-fastest lexicographic offset order of KERNEL_OFFSETS_K3."""
    h = bs + 2
    idx = np.zeros((bs ** 3, 27), np.int32)
    for x in range(bs):
        for y in range(bs):
            for z in range(bs):
                o = (x * bs + y) * bs + z
                for kk, (dx, dy, dz) in enumerate(KERNEL_OFFSETS_K3):
                    idx[o, kk] = ((x + 1 + dx) * h + (y + 1 + dy)) * h + (z + 1 + dz)
    return idx


def brick_conv(
    feats: jnp.ndarray,
    level: BrickLevel,
    weights: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.float32,
    impl: str | None = None,
) -> jnp.ndarray:
    """Submanifold 3x3x3 conv via dense bricks. weights: [27, Cin, Cout] in the
    z-fastest lexicographic offset order (== KERNEL_OFFSETS_K3).

    Halo assembly is ONE gather with a statically-patterned index array
    (halo cell c of brick b reads dense row ``nbr[b, k(c)] * vol + slot(c)``).
    ``impl="conv"`` then runs lax.conv on the [NB, bs+2, ...] halo;
    ``impl="unfold"`` im2cols with a static index table and runs a single
    [NB*vol, 27*Cin] @ [27*Cin, Cout] GEMM.
    """
    if impl is None:
        impl = os.environ.get("PST_BRICK_IMPL", "unfold")
    n, cin = feats.shape
    k, wcin, cout = weights.shape
    assert k == 27 and wcin == cin
    bs = level.brick_size
    vol = bs ** 3
    nb = level.num_bricks
    h = bs + 2

    cdt = jnp.dtype(compute_dtype)
    x = feats.astype(cdt)
    dense = jnp.zeros(((nb + 1) * vol, cin), cdt)
    tgt = jnp.where(level.brick_row >= 0, level.brick_row * vol + level.slot, (nb + 1) * vol)
    dense = dense.at[tgt].set(x, mode="drop")

    cell_k, cell_slot = _halo_tables(bs)
    safe_nbr = jnp.where(level.nbr >= 0, level.nbr, nb)  # nb = zero brick
    # [NB, h^3] flat dense-row index per halo cell; one gather builds the halo
    halo_rows = jnp.take(safe_nbr, jnp.asarray(cell_k), axis=1) * vol + jnp.asarray(
        cell_slot
    )[None, :]
    halo = jnp.take(dense, halo_rows.reshape(-1), axis=0).reshape(nb, h ** 3, cin)

    if impl == "conv":
        w = weights.astype(cdt).reshape(3, 3, 3, cin, cout)
        out = jax.lax.conv_general_dilated(
            halo.reshape(nb, h, h, h, cin),
            w,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).reshape(nb * vol, cout)
    else:
        unfold = jnp.asarray(_unfold_table(bs))  # [vol, 27] static
        g = jnp.take(halo, unfold.reshape(-1), axis=1)  # [NB, vol*27, Cin]
        g = g.reshape(nb * vol, 27 * cin)
        out = jnp.dot(g, weights.astype(cdt).reshape(27 * cin, cout))
        out = out.reshape(nb * vol, cout)

    src = jnp.where(
        level.brick_row >= 0, level.brick_row * vol + level.slot, 0
    )
    rows = jnp.take(out, src, axis=0)
    rows = jnp.where((level.brick_row >= 0)[:, None], rows, 0.0)
    return rows.astype(out_dtype)
