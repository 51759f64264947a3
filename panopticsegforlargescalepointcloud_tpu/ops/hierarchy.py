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
from .winconv import make_windowed, supports_windowing
from .sparse import (
    KERNEL_OFFSETS_K3,
    SparseGrid,
    derive_level_maps,
    down_map_fine_side,
    downsample,
    same_level_map,
    slot_table_from_parent,
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


# Measured occupancy on NPM3D-scale cylinder batches decays ~3.5x per
# stride-2 level (131072 -> 75517 -> 21435 -> 5548 -> 1559 -> 449 -> 168,
# scripts/profile_levels.py); the schedule below keeps ~2x headroom over
# that. Every sort/lookup/conv cost scales linearly with these caps (the r1
# halving schedule left L3-L6 4-18x over-provisioned = ~50 ms of dead conv
# work per forward).
_CAP_RATIOS = (1.0, 0.75, 0.32, 0.105, 0.04, 0.016, 0.008, 0.004, 0.002)


def default_capacities(n0: int, num_down: int, floor: int = 1024) -> Tuple[int, ...]:
    """Occupancy-matched capacity schedule (~2x headroom over measured level
    occupancy, rounded up to 512). The ``overflow`` counters flag scenes that
    exceed it - raise via the ``capacities`` argument if that happens."""
    caps = [n0]
    for level in range(1, num_down + 1):
        r = _CAP_RATIOS[min(level, len(_CAP_RATIOS) - 1)]
        c = -(-int(n0 * r) // 512) * 512  # round up to 512
        caps.append(max(min(c, n0), min(floor, n0)))
    return tuple(caps)


# Window geometry for the Pallas streaming conv (ops/winconv.py), validated
# on bench-scale maps (scripts/bench_winconv.py: zero correction entries):
# submanifold windows track the tile (w = 2*tr); down maps gather ~3.5x the
# rows per tile; union widths cover the cross-offset plane shift.
_WIN_TR = 256
_WIN_SUBM = (512, 4096)  # (w, u)
_WIN_DOWN = (2048, 8192)
_WIN_UP = (512, 4096)


def build_hierarchy(
    grid0: SparseGrid,
    num_down: int,
    capacities: Tuple[int, ...] | None = None,
    bits: BitLayout = DEFAULT_BITS,
    use_bricks: bool = False,
    brick_size: int = 2,
    brick_capacity_factor: float = 0.5,
    brick_floor: int = 512,
    map_mode: str = "derived",
    win_maps: bool = False,
) -> Hierarchy:
    """Build grids + per-level submanifold contexts + strided kernel maps.

    map_mode="derived" (default): the stride-2 hierarchy doubles as a 2x2x2
    brick tiling, so every kernel map below the top level is *derived by
    index arithmetic* from the level above (sparse.derive_same_map /
    derive_down_map) - only the tiny topmost level pays a sort-join lookup.
    This removed the dominant map-build cost (sorting ~14N keys per level).
    map_mode="lookup": the round-1 path (per-level sort-join lookups); kept
    for A/B and as the parity oracle in tests.

    use_bricks=True: submanifold convs additionally use the brick-dense
    formulation (ops/brick.py) - exact but benchmarked ~2x slower on v5e
    (PLAN.md); kept behind this flag for hardware where contiguous brick
    gathers win.

    win_maps=True: wrap every large-enough kernel map (submanifold AND
    strided) in a WindowedMap so convs run the Pallas windowed-streaming
    kernel (ops/winconv.py; 3.6-4.9x over row gathers on v5e,
    scripts/bench_winconv.py). Maps too small for windowing stay raw and
    convs fall back to row gathers there. The maps' correction overflows
    join the hierarchy ``overflow`` vector.
    """
    if capacities is None:
        capacities = default_capacities(grid0.capacity, num_down)
    assert len(capacities) == num_down + 1

    def bricks_for(grid: SparseGrid, cap: int):
        nb = max(int(cap * brick_capacity_factor), min(brick_floor, cap))
        b = build_brick_level(grid, nb, brick_size, bits)
        return b, b.overflow

    grids = [grid0]
    parents = []
    slot_tables = []
    overflows = []
    fine = grid0
    for level in range(num_down):
        coarse, parent = downsample(fine, capacities[level + 1], bits)
        # voxels whose parent got dropped show up as parent == -1 on valid rows
        dropped = jnp.sum(((parent < 0) & fine.mask).astype(jnp.int32))
        overflows.append(dropped)
        grids.append(coarse)
        parents.append(parent)
        slot_tables.append(
            slot_table_from_parent(fine, parent, capacities[level + 1])
        )
        fine = coarse

    # Submanifold 27-maps: top level by sort-join, the rest derived top-down.
    same_maps = [None] * (num_down + 1)
    same_maps[num_down] = same_level_map(grids[num_down], KERNEL_OFFSETS_K3, bits)
    if map_mode == "derived":
        down_maps = [None] * num_down
        up_maps = [None] * num_down
        for level in range(num_down - 1, -1, -1):
            same_maps[level], down_maps[level], up_maps[level] = derive_level_maps(
                grids[level], parents[level], slot_tables[level],
                same_maps[level + 1],
            )
    else:
        for level in range(num_down - 1, -1, -1):
            same_maps[level] = same_level_map(grids[level], KERNEL_OFFSETS_K3, bits)
        down_maps = [
            down_map_fine_side(grids[level], grids[level + 1], bits)
            for level in range(num_down)
        ]
        up_maps = [
            up_map_from_down(down_maps[level], capacities[level])
            for level in range(num_down)
        ]

    if use_bricks:
        bricks = []
        for level in range(num_down + 1):
            ctx, ov = bricks_for(grids[level], capacities[level])
            bricks.append(ctx)
            overflows.append(ov)
    else:
        bricks = same_maps
        overflows.append(jnp.zeros((), jnp.int32))

    if win_maps and not use_bricks:
        def windowify(maps, n_ins, w, u):
            out = []
            for m, n_in in zip(maps, n_ins):
                if m is not None and supports_windowing(
                    m.shape[0], n_in, _WIN_TR, u
                ):
                    wm = make_windowed(m, n_in, _WIN_TR, w, u)
                    overflows.append(wm.overflow)
                    out.append(wm)
                else:
                    out.append(m)
            return out

        bricks = windowify(
            bricks, [capacities[l] for l in range(num_down + 1)], *_WIN_SUBM
        )
        down_maps = windowify(
            down_maps, [capacities[l] for l in range(num_down)], *_WIN_DOWN
        )
        up_maps = windowify(
            up_maps, [capacities[l + 1] for l in range(num_down)], *_WIN_UP
        )

    return Hierarchy(
        grids=tuple(grids),
        bricks=tuple(bricks),
        down_maps=tuple(down_maps),
        up_maps=tuple(up_maps),
        parents=tuple(parents),
        overflow=jnp.stack(overflows),
    )
