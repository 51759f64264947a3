"""Brick-dense conv must exactly match the gather-based sparse conv."""

import jax.numpy as jnp
import numpy as np

from panopticsegforlargescalepointcloud_tpu.ops import (
    make_grid,
    same_level_map,
    sparse_conv,
)
from panopticsegforlargescalepointcloud_tpu.ops.brick import (
    brick_conv,
    build_brick_level,
)


def build(rng, n=300, cap=512, extent=14, batch_size=2):
    coords = rng.integers(-extent, extent, size=(n, 3)).astype(np.int32)
    batch = rng.integers(0, batch_size, size=(n,)).astype(np.int32)
    u = np.unique(np.concatenate([batch[:, None], coords], 1), axis=0)
    batch, coords = u[:, 0].astype(np.int32), u[:, 1:].astype(np.int32)
    n = len(batch)
    pb = np.zeros(cap, np.int32)
    pc = np.zeros((cap, 3), np.int32)
    pm = np.zeros(cap, bool)
    pb[:n], pc[:n], pm[:n] = batch, coords, True
    grid, _ = make_grid(jnp.asarray(pb), jnp.asarray(pc), jnp.asarray(pm))
    return grid, n


class TestBrickConv:
    def test_matches_gather_conv(self, rng):
        grid, n = build(rng)
        cap = grid.capacity
        cin, cout = 6, 10
        feats = np.zeros((cap, cin), np.float32)
        feats[np.asarray(grid.mask)] = rng.normal(
            size=(int(grid.count()), cin)
        ).astype(np.float32)
        w = rng.normal(size=(27, cin, cout)).astype(np.float32)

        nbr = same_level_map(grid)
        ref = np.asarray(sparse_conv(jnp.asarray(feats), nbr, jnp.asarray(w)))

        for bs in (2, 4):
            level = build_brick_level(grid, num_bricks=cap, brick_size=bs)
            assert int(level.overflow) == 0
            for impl in ("unfold", "conv"):
                got = np.asarray(
                    brick_conv(
                        jnp.asarray(feats), level, jnp.asarray(w),
                        compute_dtype=jnp.float32, impl=impl,
                    )
                )
                np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                                           err_msg=f"bs={bs} impl={impl}")

    def test_overflow_counter(self, rng):
        grid, n = build(rng, n=300)
        level = build_brick_level(grid, num_bricks=8, brick_size=4)
        assert int(level.overflow) > 0  # deliberately tiny capacity
