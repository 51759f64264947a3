"""Multi-resolution sparse grid hierarchies.

Replaces MinkowskiEngine's coordinate-manager cache of strided coordinate maps
and kernel maps (built lazily inside CUDA convs in the reference; here built
once per step, on device, and shared by every conv at a level - the backbone
applies 4N+2 convs per level, so map reuse matters).

Stride-1 (submanifold) convs use the brick-dense formulation
(:mod:`.brick`): each level carries a BrickLevel (voxel->brick tiling +
brick-level neighbor map) instead of a voxel-level 27-neighbor map - brick
lookups are ~an order of magnitude fewer queries and the conv itself becomes
a dense ``lax.conv``. Strided transitions keep row-gather kernel maps (2 per
level vs 8 submanifold convs); up maps are derived from down maps by
transposition (identical connectivity, no lookups).

All shapes are static: level capacities are a config tuple. Real LiDAR tiles
lose ~2-4x occupancy per stride-2 level; capacities default to a conservative
halving schedule with a floor. Overflow (unique coarse voxels or bricks
beyond capacity) drops deterministically and is surfaced via ``overflow``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .brick import BrickLevel, build_brick_level
from .hashing import BitLayout, DEFAULT_BITS
from .sparse import (
    KERNEL_OFFSETS_K3,
    SparseGrid,
    down_map_fine_side,
    downsample,
    same_level_map,
    up_map_from_down,
)


class Hierarchy(NamedTuple):
    """Grids, brick tilings and strided kernel maps for an L-level UNet.

    Attributes:
      grids: length L+1; grids[l] at stride 2^l (coords in stride units).
      bricks: length L+1; per-level submanifold-conv context: a [N, 27] row
        kernel map (default) or a BrickLevel when use_bricks is on.
      down_maps: length L; [N_{l+1}, 27] stride-2 conv map (gathers level l).
      up_maps: length L; [N_l, 27] transpose conv map (gathers level l+1).
      parents: length L; [N_l] int32 fine row -> coarse row (pooling map).
      overflow: [*] int32 dropped voxel/brick counters.
    """

    grids: Tuple[SparseGrid, ...]
    bricks: Tuple[BrickLevel, ...]
    down_maps: Tuple[jnp.ndarray, ...]
    up_maps: Tuple[jnp.ndarray, ...]
    parents: Tuple[jnp.ndarray, ...]
    overflow: jnp.ndarray

    @property
    def num_levels(self) -> int:
        return len(self.grids)


def default_capacities(n0: int, num_down: int, floor: int = 2048) -> Tuple[int, ...]:
    """Capacity schedule tuned on NPM3D-scale cylinder batches (measured
    occupancy 0.58/0.16/0.042/... of N at L1/L2/L3): [n0, 3n0/4, 3n0/8, ...]
    with a floor. Every sort/lookup/conv cost scales with these caps; the
    ``overflow`` counters flag scenes that exceed them (raise via the
    ``capacities`` argument if that happens).
    """
    caps = [n0]
    c = (3 * n0) // 4
    for level in range(1, num_down + 1):
        caps.append(max(c, min(floor, n0)))
        c //= 2
    return tuple(caps)


def build_hierarchy(
    grid0: SparseGrid,
    num_down: int,
    capacities: Tuple[int, ...] | None = None,
    bits: BitLayout = DEFAULT_BITS,
    use_bricks: bool = False,
    brick_size: int = 2,
    brick_capacity_factor: float = 0.5,
    brick_floor: int = 512,
) -> Hierarchy:
    """Build grids + per-level submanifold contexts + strided kernel maps.

    use_bricks=False (default): submanifold convs use [N, 27] row kernel maps
    (sort-join lookups). The brick-dense alternative (ops/brick.py) is exact
    but benchmarked ~2x slower on v5e (PLAN.md) - kept behind this flag for
    hardware where contiguous brick gathers win.
    """
    if capacities is None:
        capacities = default_capacities(grid0.capacity, num_down)
    assert len(capacities) == num_down + 1

    def bricks_for(grid: SparseGrid, cap: int):
        if not use_bricks:
            m = same_level_map(grid, KERNEL_OFFSETS_K3, bits)
            return m, jnp.zeros((), jnp.int32)
        nb = max(int(cap * brick_capacity_factor), min(brick_floor, cap))
        b = build_brick_level(grid, nb, brick_size, bits)
        return b, b.overflow

    grids = [grid0]
    ctx0, ov0 = bricks_for(grid0, capacities[0])
    bricks = [ctx0]
    down_maps = []
    up_maps = []
    parents = []
    overflows = [ov0]
    fine = grid0
    for level in range(num_down):
        coarse, parent = downsample(fine, capacities[level + 1], bits)
        # voxels whose parent got dropped show up as parent == -1 on valid rows
        dropped = jnp.sum(((parent < 0) & fine.mask).astype(jnp.int32))
        overflows.append(dropped)
        grids.append(coarse)
        parents.append(parent)
        dmap = down_map_fine_side(fine, coarse, bits)
        down_maps.append(dmap)
        up_maps.append(up_map_from_down(dmap, fine.capacity))
        ctx, ov = bricks_for(coarse, capacities[level + 1])
        bricks.append(ctx)
        overflows.append(ov)
        fine = coarse

    return Hierarchy(
        grids=tuple(grids),
        bricks=tuple(bricks),
        down_maps=tuple(down_maps),
        up_maps=tuple(up_maps),
        parents=tuple(parents),
        overflow=jnp.stack(overflows),
    )
