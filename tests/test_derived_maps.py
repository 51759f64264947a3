"""Derived kernel maps == sort-join kernel maps, exactly.

The stride-2 hierarchy doubles as a 2x2x2 brick tiling: level l+1's 27-map +
the brick slot table determine level l's 27-map and the stride-2 down map by
pure index arithmetic (ops/sparse.py derive_*). These tests pin exactness
against the round-1 lookup path on random multi-sample grids with negative
coords, plus hierarchy-level equality, so the fast path can never drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticsegforlargescalepointcloud_tpu.ops.hashing import DEFAULT_BITS
from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
from panopticsegforlargescalepointcloud_tpu.ops.sparse import (
    KERNEL_OFFSETS_K3,
    derive_down_map,
    derive_same_map,
    down_map_fine_side,
    downsample,
    make_grid,
    same_level_map,
    slot_table_from_parent,
)


def random_grid(rng, n_valid, capacity, n_batch=2, span=40):
    coords = rng.integers(-span, span, size=(n_valid, 3)).astype(np.int32)
    batch = rng.integers(0, n_batch, size=(n_valid,)).astype(np.int32)
    mask = np.ones((n_valid,), bool)
    pad = capacity - n_valid
    coords = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    batch = np.concatenate([batch, -np.ones((pad,), np.int32)])
    mask = np.concatenate([mask, np.zeros((pad,), bool)])
    grid, _ = make_grid(jnp.asarray(batch), jnp.asarray(coords), jnp.asarray(mask))
    return grid


class TestDerivedMaps:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_same_and_down_maps_match_lookup(self, seed):
        rng = np.random.default_rng(seed)
        fine = random_grid(rng, n_valid=900, capacity=1024)
        coarse, parent = downsample(fine, 1024, DEFAULT_BITS)
        assert int(jnp.sum((parent < 0) & fine.mask)) == 0  # no overflow
        slots = slot_table_from_parent(fine, parent, 1024)
        coarse_map = same_level_map(coarse, KERNEL_OFFSETS_K3, DEFAULT_BITS)

        got_same = derive_same_map(fine, parent, slots, coarse_map)
        want_same = same_level_map(fine, KERNEL_OFFSETS_K3, DEFAULT_BITS)
        np.testing.assert_array_equal(np.asarray(got_same), np.asarray(want_same))

        got_down = derive_down_map(coarse_map, slots)
        want_down = down_map_fine_side(fine, coarse, DEFAULT_BITS)
        np.testing.assert_array_equal(np.asarray(got_down), np.asarray(want_down))

    def test_hierarchy_modes_agree(self):
        rng = np.random.default_rng(7)
        grid = random_grid(rng, n_valid=1500, capacity=2048, span=25)
        caps = (2048, 2048, 1536, 768)
        fast = build_hierarchy(grid, 3, capacities=caps, map_mode="derived")
        slow = build_hierarchy(grid, 3, capacities=caps, map_mode="lookup")
        assert int(jnp.sum(fast.overflow)) == 0
        for l in range(4):
            np.testing.assert_array_equal(
                np.asarray(fast.bricks[l]), np.asarray(slow.bricks[l]), err_msg=f"same map L{l}"
            )
            np.testing.assert_array_equal(
                np.asarray(fast.grids[l].keys), np.asarray(slow.grids[l].keys)
            )
        for l in range(3):
            np.testing.assert_array_equal(
                np.asarray(fast.down_maps[l]), np.asarray(slow.down_maps[l]), err_msg=f"down L{l}"
            )
            np.testing.assert_array_equal(
                np.asarray(fast.up_maps[l]), np.asarray(slow.up_maps[l]), err_msg=f"up L{l}"
            )

    def test_jit_and_odd_negative_coords(self):
        """Parity arithmetic must be right for negative coords (floor, not
        trunc) - exercise a grid biased to negative odd coordinates."""
        rng = np.random.default_rng(11)
        coords = (rng.integers(-31, 1, size=(400, 3)) * 2 + 1).astype(np.int32)
        coords = np.concatenate([coords, rng.integers(-33, 33, (400, 3)).astype(np.int32)])
        batch = np.zeros((800,), np.int32)
        mask = np.ones((800,), bool)
        grid, _ = make_grid(jnp.asarray(batch), jnp.asarray(coords), jnp.asarray(mask))

        @jax.jit
        def go(g):
            return build_hierarchy(g, 2, capacities=(800, 800, 800))

        h = go(grid)
        want = same_level_map(h.grids[0], KERNEL_OFFSETS_K3, DEFAULT_BITS)
        np.testing.assert_array_equal(np.asarray(h.bricks[0]), np.asarray(want))


class TestFusedLevelMaps:
    """derive_level_maps == (derive_same_map, derive_down_map,
    up_map_from_down(derive_down_map)), bit for bit - including when the
    coarse capacity overflows (dropped parents must yield -1 rows)."""

    @pytest.mark.parametrize("seed,coarse_cap", [(0, 1024), (3, 1024), (5, 256)])
    def test_matches_split_derive(self, seed, coarse_cap):
        from panopticsegforlargescalepointcloud_tpu.ops.sparse import (
            derive_level_maps,
            up_map_from_down,
        )

        rng = np.random.default_rng(seed)
        fine = random_grid(rng, n_valid=900, capacity=1024, span=20)
        coarse, parent = downsample(fine, coarse_cap, DEFAULT_BITS)
        slots = slot_table_from_parent(fine, parent, coarse_cap)
        coarse_map = same_level_map(coarse, KERNEL_OFFSETS_K3, DEFAULT_BITS)

        same, down, up = jax.jit(derive_level_maps)(fine, parent, slots, coarse_map)
        want_same = derive_same_map(fine, parent, slots, coarse_map)
        want_down = derive_down_map(coarse_map, slots)
        want_up = up_map_from_down(want_down, fine.capacity)
        if coarse_cap < 1024:  # overflow case: confirm it actually triggers
            assert int(jnp.sum((parent < 0) & fine.mask)) > 0
        np.testing.assert_array_equal(np.asarray(same), np.asarray(want_same))
        np.testing.assert_array_equal(np.asarray(down), np.asarray(want_down))
        np.testing.assert_array_equal(np.asarray(up), np.asarray(want_up))
