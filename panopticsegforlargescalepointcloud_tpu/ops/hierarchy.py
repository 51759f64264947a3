"""Multi-resolution sparse grid hierarchies.

Replaces MinkowskiEngine's coordinate-manager cache of strided coordinate maps
and kernel maps (built lazily inside CUDA convs in the reference; here built
once per step, on device, and shared by every conv at a level - the backbone
applies 4N+2 convs per level, so map reuse matters).

All shapes are static: level capacities are a config tuple. Real LiDAR tiles
lose ~2-4x occupancy per stride-2 level; capacities default to a conservative
halving schedule with a floor. Overflow (more unique coarse voxels than
capacity) drops the highest-key voxels deterministically; `overflow` flags
let trainers surface a warning metric.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .hashing import BitLayout, DEFAULT_BITS
from .sparse import (
    KERNEL_OFFSETS_K3,
    SparseGrid,
    down_map,
    downsample,
    same_level_map,
    up_map_from_down,
)


class Hierarchy(NamedTuple):
    """Grids and kernel maps for an L-level sparse UNet.

    Attributes:
      grids: length L+1; grids[l] at stride 2^l (coords in stride units).
      same_maps: length L+1; [N_l, 27] submanifold map at each level.
      down_maps: length L; [N_{l+1}, 27] stride-2 conv map (gathers level l).
      up_maps: length L; [N_l, 27] transpose conv map (gathers level l+1).
      parents: length L; [N_l] int32 fine row -> coarse row (pooling map).
      overflow: [L] int32, number of coarse voxels dropped per transition.
    """

    grids: Tuple[SparseGrid, ...]
    same_maps: Tuple[jnp.ndarray, ...]
    down_maps: Tuple[jnp.ndarray, ...]
    up_maps: Tuple[jnp.ndarray, ...]
    parents: Tuple[jnp.ndarray, ...]
    overflow: jnp.ndarray

    @property
    def num_levels(self) -> int:
        return len(self.grids)


def default_capacities(n0: int, num_down: int, floor: int = 1024) -> Tuple[int, ...]:
    """Halving capacity schedule: [n0, n0, n0/2, n0/4, ...] with a floor.

    Level 1 keeps the full capacity because stride-2 on thin structures
    (poles, trunks) can retain nearly every voxel.
    """
    caps = [n0]
    for level in range(1, num_down + 1):
        caps.append(max(n0 >> max(level - 1, 0), floor))
    return tuple(caps)


def build_hierarchy(
    grid0: SparseGrid,
    num_down: int,
    capacities: Tuple[int, ...] | None = None,
    bits: BitLayout = DEFAULT_BITS,
) -> Hierarchy:
    """Build grids + kernel maps for `num_down` stride-2 transitions."""
    if capacities is None:
        capacities = default_capacities(grid0.capacity, num_down)
    assert len(capacities) == num_down + 1

    # NOTE: a bucketed hash-table variant (ops/bucket.py) was benchmarked and
    # is 4x slower than the sort-join lookup on v5e (random 16-slot gathers
    # lose to one large co-sort); hierarchy uses the sort-join path.
    grids = [grid0]
    same_maps = [same_level_map(grid0, KERNEL_OFFSETS_K3, bits)]
    down_maps = []
    up_maps = []
    parents = []
    overflows = []
    fine = grid0
    for level in range(num_down):
        coarse, parent = downsample(fine, capacities[level + 1], bits)
        # voxels whose parent got dropped show up as parent == -1 on valid rows
        dropped = jnp.sum(
            ((parent < 0) & fine.mask).astype(jnp.int32)
        )
        overflows.append(dropped)
        grids.append(coarse)
        parents.append(parent)
        dmap = down_map(fine, coarse, KERNEL_OFFSETS_K3, bits)
        down_maps.append(dmap)
        up_maps.append(up_map_from_down(dmap, fine.capacity))
        same_maps.append(same_level_map(coarse, KERNEL_OFFSETS_K3, bits))
        fine = coarse

    return Hierarchy(
        grids=tuple(grids),
        same_maps=tuple(same_maps),
        down_maps=tuple(down_maps),
        up_maps=tuple(up_maps),
        parents=tuple(parents),
        overflow=jnp.stack(overflows) if overflows else jnp.zeros((0,), jnp.int32),
    )
