"""Transpose-map custom VJP of sparse_conv vs plain autodiff.

The backward of the conv's gather is a scatter-add under plain autodiff
(7x slower than gathers on v5e); ops/conv.py routes it through the transpose
kernel map instead. These tests pin exact gradient agreement for all three
map configurations (submanifold map against itself, down against up, up
against down) in both execution modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticsegforlargescalepointcloud_tpu.ops.conv import sparse_conv
from panopticsegforlargescalepointcloud_tpu.ops.sparse import (
    KERNEL_OFFSETS_K3,
    down_map_fine_side,
    downsample,
    make_grid,
    same_level_map,
    up_map_from_down,
)


@pytest.fixture(scope="module")
def maps(module_rng):
    rng = module_rng
    n = 500
    coords = rng.integers(-10, 10, (n, 3)).astype(np.int32)
    batch = np.zeros(n, np.int32)
    mask = np.ones(n, bool)
    mask[-50:] = False
    grid, _ = make_grid(jnp.asarray(batch), jnp.asarray(coords), jnp.asarray(mask))
    smap = same_level_map(grid, KERNEL_OFFSETS_K3)
    coarse, _ = downsample(grid, 256)
    dmap = down_map_fine_side(grid, coarse)
    umap = up_map_from_down(dmap, n)
    return n, smap, dmap, umap


@pytest.fixture(scope="module")
def module_rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("mode", ["fused", "loop"])
@pytest.mark.parametrize("pair", ["same", "down", "up"])
def test_grads_match_autodiff(maps, module_rng, mode, pair):
    n, smap, dmap, umap = maps
    rng = module_rng
    cin, cout = 8, 12
    w = jnp.asarray(rng.normal(size=(27, cin, cout)), jnp.float32)
    idx, idx_t = {
        "same": (smap, smap),
        "down": (dmap, umap),
        "up": (umap, dmap),
    }[pair]
    n_in = {"same": n, "down": n, "up": 256}[pair]
    f = jnp.asarray(rng.normal(size=(n_in, cin)), jnp.float32)

    def loss(use_t):
        def fn(f, w):
            out = sparse_conv(
                f, idx, w, mode=mode, nbr_idx_t=idx_t if use_t else None
            )
            return jnp.mean(jax.nn.relu(out) ** 2)
        return fn

    gf0, gw0 = jax.grad(loss(False), argnums=(0, 1))(f, w)
    gf1, gw1 = jax.grad(loss(True), argnums=(0, 1))(f, w)
    for a, b in [(gf0, gf1), (gw0, gw1)]:
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5
