"""Windowed Pallas conv (ops/winconv.py) vs the row-gather conv oracle.

Runs in Pallas interpret mode on the CPU test backend (conftest). Shapes are
small but real: maps come from actual SparseGrids via same_level_map /
hierarchy builds, so column monotonicity and absent-entry patterns match
production. Covers: forward parity, both grads (transpose-map backward),
the exact out-of-window correction path, asymmetric channels, and strided
(down/up) maps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticsegforlargescalepointcloud_tpu.ops.conv import sparse_conv
from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
from panopticsegforlargescalepointcloud_tpu.ops.sparse import (
    KERNEL_OFFSETS_K3,
    make_grid,
    same_level_map,
)
from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
    make_windowed,
    supports_windowing,
    windowed_conv,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def blob_grid(rng, n=2048, occupied=1900, scale=(12, 12, 3)):
    pts = (rng.normal(size=(4 * n, 3)) * np.array(scale)).astype(np.int32)
    uniq = np.unique(pts, axis=0)[:occupied]
    coords = np.zeros((n, 3), np.int32)
    coords[: len(uniq)] = uniq
    mask = np.zeros(n, bool)
    mask[: len(uniq)] = True
    grid, _ = jax.jit(make_grid)(
        jnp.zeros(n, jnp.int32), jnp.asarray(coords), jnp.asarray(mask)
    )
    return grid


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-9)


class TestWindowedConv:
    def test_map_columns_monotone(self, rng):
        """The invariant the kernel rests on: key-sorted rows make every map
        column non-decreasing over valid entries."""
        grid = blob_grid(rng)
        nbr = np.asarray(
            jax.jit(lambda g: same_level_map(g, KERNEL_OFFSETS_K3))(grid)
        )
        for k in range(27):
            col = nbr[:, k]
            v = col[col >= 0]
            assert np.all(np.diff(v) >= 0), f"column {k} not monotone"

    @pytest.mark.parametrize("cin,cout", [(16, 16), (16, 32), (32, 16), (4, 16), (24, 8)])
    def test_submanifold_parity(self, rng, cin, cout):
        grid = blob_grid(rng)
        n = grid.capacity
        nbr = jax.jit(lambda g: same_level_map(g, KERNEL_OFFSETS_K3))(grid)
        feats = jnp.asarray(rng.normal(size=(n, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.2, jnp.bfloat16)
        ref = jax.jit(
            lambda f: sparse_conv(f, nbr, w, mode="fused", out_dtype=jnp.float32)
        )(feats)
        wm = jax.jit(lambda: make_windowed(nbr, n, tr=256, w=512, u=2048))()
        assert int(wm.overflow) == 0
        out = jax.jit(lambda f: windowed_conv(f, wm, w))(feats)
        assert rel_err(ref, out) < 2e-2

    def test_grads_through_transpose_map(self, rng):
        grid = blob_grid(rng)
        n = grid.capacity
        nbr = jax.jit(lambda g: same_level_map(g, KERNEL_OFFSETS_K3))(grid)
        feats = jnp.asarray(rng.normal(size=(n, 16)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, 16, 16)) * 0.2, jnp.float32)
        wm = jax.jit(lambda: make_windowed(nbr, n, tr=256, w=512, u=2048))()

        def loss_ref(f, wt):
            return jnp.sum(
                sparse_conv(f, nbr, wt.astype(jnp.bfloat16), mode="fused",
                            out_dtype=jnp.float32) ** 2
            )

        def loss_win(f, wt):
            return jnp.sum(
                windowed_conv(f, wm, wt.astype(jnp.bfloat16)) ** 2
            )

        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(feats, w)
        gw = jax.jit(jax.grad(loss_win, argnums=(0, 1)))(feats, w)
        assert rel_err(gr[0], gw[0]) < 2e-2  # dfeats
        assert rel_err(gr[1], gw[1]) < 2e-2  # dW

    def test_grads_wide_channels(self, rng):
        """C=64 (lane pack P=2): the width training runs after the gate
        removal in models/modules.py - the old correction pass materialized
        [cap, C, Cout] tensors that made wide-channel backward pathological;
        this pins fwd + both grads at the width that regressed."""
        grid = blob_grid(rng, n=1024, occupied=950, scale=(10, 10, 3))
        n = grid.capacity
        nbr = jax.jit(lambda g: same_level_map(g, KERNEL_OFFSETS_K3))(grid)
        feats = jnp.asarray(rng.normal(size=(n, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, 64, 64)) * 0.1, jnp.float32)
        wm = jax.jit(lambda: make_windowed(nbr, n, tr=256, w=512, u=1024))()
        assert int(wm.overflow) == 0

        def loss_ref(f, wt):
            return jnp.sum(
                sparse_conv(f, nbr, wt.astype(jnp.bfloat16), mode="fused",
                            out_dtype=jnp.float32) ** 2
            )

        def loss_win(f, wt):
            return jnp.sum(
                windowed_conv(f, wm, wt.astype(jnp.bfloat16)) ** 2
            )

        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(feats, w)
        gw = jax.jit(jax.grad(loss_win, argnums=(0, 1)))(feats, w)
        assert rel_err(gr[0], gw[0]) < 2e-2
        assert rel_err(gr[1], gw[1]) < 2e-2

    def test_correction_path_exact(self, rng):
        """Force out-of-window entries with an undersized window: the XLA
        correction list must repair them exactly (fwd + both grads)."""
        grid = blob_grid(rng, n=1024, occupied=1000, scale=(10, 10, 3))
        n = grid.capacity
        nbr = jax.jit(lambda g: same_level_map(g, KERNEL_OFFSETS_K3))(grid)
        feats = jnp.asarray(rng.normal(size=(n, 16)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, 16, 16)) * 0.2, jnp.float32)
        wm = jax.jit(
            lambda: make_windowed(nbr, n, tr=256, w=256, u=1024, corr_cap=8192)
        )()
        assert int(wm.corr_count) > 0, "window too generous to test corrections"
        assert int(wm.overflow) == 0
        ref = jax.jit(
            lambda f: sparse_conv(f, nbr, w.astype(jnp.bfloat16), mode="fused",
                                  out_dtype=jnp.float32)
        )(feats)
        out = jax.jit(lambda f: windowed_conv(f, wm, w.astype(jnp.bfloat16)))(feats)
        assert rel_err(ref, out) < 2e-2

        def loss_ref(f, wt):
            return jnp.sum(
                sparse_conv(f, nbr, wt.astype(jnp.bfloat16), mode="fused",
                            out_dtype=jnp.float32) ** 2
            )

        def loss_win(f, wt):
            return jnp.sum(windowed_conv(f, wm, wt.astype(jnp.bfloat16)) ** 2)

        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(feats, w)
        gw = jax.jit(jax.grad(loss_win, argnums=(0, 1)))(feats, w)
        assert rel_err(gr[0], gw[0]) < 2e-2
        assert rel_err(gr[1], gw[1]) < 2e-2

    def test_overflow_counter(self, rng):
        """Entries beyond corr_cap are counted, making inexactness visible."""
        grid = blob_grid(rng, n=1024, occupied=1000, scale=(10, 10, 3))
        n = grid.capacity
        nbr = jax.jit(lambda g: same_level_map(g, KERNEL_OFFSETS_K3))(grid)
        wm = jax.jit(lambda: make_windowed(nbr, n, tr=256, w=64, u=1024, corr_cap=8))()
        assert int(wm.overflow) > 0

    def test_strided_maps_parity(self, rng):
        """Down/up maps from a real hierarchy: same kernel, partner
        transpose maps (mirrors models/unet.py wiring)."""
        grid = blob_grid(rng, n=4096, occupied=3800, scale=(16, 16, 4))
        hier = jax.jit(
            lambda g: build_hierarchy(g, 2, capacities=(4096, 2048, 1024))
        )(grid)
        down = hier.down_maps[0]
        up = hier.up_maps[0]
        n_fine, n_coarse = 4096, 2048
        feats = jnp.asarray(rng.normal(size=(n_fine, 16)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, 16, 16)) * 0.2, jnp.bfloat16)
        assert supports_windowing(n_coarse, n_fine, 256, 4096)
        wm_d = jax.jit(lambda: make_windowed(down, n_fine, tr=256, w=2048, u=4096))()
        wm_u = jax.jit(lambda: make_windowed(up, n_coarse, tr=256, w=512, u=2048))()
        assert int(wm_d.overflow) == 0 and int(wm_u.overflow) == 0

        ref_d = jax.jit(
            lambda f: sparse_conv(f, down, w, mode="fused",
                                  out_dtype=jnp.float32, nbr_idx_t=up)
        )(feats)
        out_d = jax.jit(lambda f: windowed_conv(f, wm_d, w, wm_u))(feats)
        assert rel_err(ref_d, out_d) < 2e-2

        cfeats = jnp.asarray(rng.normal(size=(n_coarse, 16)), jnp.bfloat16)
        ref_u = jax.jit(
            lambda f: sparse_conv(f, up, w, mode="fused",
                                  out_dtype=jnp.float32, nbr_idx_t=down)
        )(cfeats)
        out_u = jax.jit(lambda f: windowed_conv(f, wm_u, w, wm_d))(cfeats)
        assert rel_err(ref_u, out_u) < 2e-2

        # grads across the down/up transpose pair
        def loss_ref(f):
            return jnp.sum(
                sparse_conv(f, down, w, mode="fused", out_dtype=jnp.float32,
                            nbr_idx_t=up) ** 2
            )

        def loss_win(f):
            return jnp.sum(windowed_conv(f, wm_d, w, wm_u) ** 2)

        gr = jax.jit(jax.grad(loss_ref))(feats)
        gw = jax.jit(jax.grad(loss_win))(feats)
        assert rel_err(gr, gw) < 2e-2


class TestUNetIntegration:
    def test_unet_forward_parity_win_vs_rows(self, rng):
        """Full SparseUNet forward with win_maps hierarchies (mixed contexts:
        L0 windowed, strided maps raw at this scale) must match the row-map
        hierarchy with identical params (the production integration path:
        PanopticConfig.use_winconv -> build_hierarchy(win_maps=...))."""
        import flax.linen  # noqa: F401  (env sanity)
        from panopticsegforlargescalepointcloud_tpu.models.unet import SparseUNet

        grid = blob_grid(rng, n=4096, occupied=3900, scale=(16, 16, 4))
        caps = (4096, 2048, 1024)
        hier_rows = jax.jit(
            lambda g: build_hierarchy(g, 2, capacities=caps)
        )(grid)
        hier_win = jax.jit(
            lambda g: build_hierarchy(g, 2, capacities=caps, win_maps=True)
        )(grid)
        from panopticsegforlargescalepointcloud_tpu.ops.winconv import WindowedMap
        assert isinstance(hier_win.bricks[0], WindowedMap)

        net = SparseUNet(
            down_channels=((4, 8), (8, 16)),
            up_channels=((24, 8),),
            down_strides=(1, 2),
            up_strides=(2,),
            num_blocks=1,
            gemm_mode="fused",
            compute_dtype="bfloat16",
        )
        x = jnp.asarray(rng.normal(size=(4096, 4)), jnp.float32)
        variables = net.init(
            jax.random.PRNGKey(0), x, hier_rows, False
        )
        ref = jax.jit(
            lambda v, xx: net.apply(v, xx, hier_rows, False)
        )(variables, x)
        out = jax.jit(
            lambda v, xx: net.apply(v, xx, hier_win, False)
        )(variables, x)
        assert rel_err(ref, out) < 3e-2
