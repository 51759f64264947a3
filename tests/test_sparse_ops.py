"""Unit tests for the sparse voxel core: hashing, grids, kernel maps, conv.

Parity strategy (mirrors the reference's natural verification seams, see
SURVEY.md §4): the sparse conv on a small grid must equal a dense 3D
convolution evaluated at occupied sites only (submanifold) or at strided
sites (down conv).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticsegforlargescalepointcloud_tpu.ops import (
    DEFAULT_BITS,
    INVALID_KEY,
    SparseGrid,
    KERNEL_OFFSETS_K3,
    down_map,
    down_map_fine_side,
    downsample,
    lookup,
    make_grid,
    pack_coords,
    same_level_map,
    sparse_conv,
    unpack_coords,
    up_map,
    up_map_from_down,
)


def random_coords(rng, n, lo=-20, hi=20, batch_size=3):
    coords = rng.integers(lo, hi, size=(n, 3)).astype(np.int32)
    batch = rng.integers(0, batch_size, size=(n,)).astype(np.int32)
    # dedup host-side for ground truth
    key = [tuple([b] + list(c)) for b, c in zip(batch, coords)]
    _, idx = np.unique(key, axis=0, return_index=True)
    return batch[idx], coords[idx]


class TestHashing:
    def test_roundtrip(self, rng):
        batch, coords = random_coords(rng, 200)
        keys = pack_coords(jnp.asarray(batch), jnp.asarray(coords))
        b2, c2 = unpack_coords(keys)
        np.testing.assert_array_equal(np.asarray(b2), batch)
        np.testing.assert_array_equal(np.asarray(c2), coords)

    def test_out_of_range_is_invalid(self):
        batch = jnp.asarray([0, 0, 0, 20], dtype=jnp.int32)
        coords = jnp.asarray(
            [[0, 0, 0], [1 << 12, 0, 0], [0, 0, -(1 << 9)], [1, 1, 1]],
            dtype=jnp.int32,
        )
        keys = pack_coords(batch, coords)
        assert keys[0] != INVALID_KEY
        assert keys[1] == INVALID_KEY
        assert keys[2] == INVALID_KEY
        assert keys[3] == INVALID_KEY  # batch 20 > max_batch-1 for 4 batch bits

    def test_lookup(self, rng):
        batch, coords = random_coords(rng, 300)
        keys = np.asarray(pack_coords(jnp.asarray(batch), jnp.asarray(coords)))
        order = np.argsort(keys)
        skeys = jnp.asarray(keys[order])
        # every key must be found at its own position
        found = lookup(skeys, skeys)
        np.testing.assert_array_equal(np.asarray(found), np.arange(len(keys)))
        # a missing key must return -1
        missing = pack_coords(
            jnp.asarray([0], dtype=jnp.int32),
            jnp.asarray([[499, 499, 120]], dtype=jnp.int32),
        )
        assert int(lookup(skeys, missing)[0]) == -1


class TestGrid:
    def test_make_grid_canonical(self, rng):
        batch, coords = random_coords(rng, 150)
        n, cap = len(batch), 256
        pb = np.full(cap, 0, dtype=np.int32)
        pc = np.zeros((cap, 3), dtype=np.int32)
        pm = np.zeros(cap, dtype=bool)
        pb[:n], pc[:n], pm[:n] = batch, coords, True
        grid, inverse = make_grid(jnp.asarray(pb), jnp.asarray(pc), jnp.asarray(pm))
        keys = np.asarray(grid.keys)
        assert np.all(np.diff(keys.astype(np.int64)) >= 0)
        assert int(grid.count()) == n
        # inverse maps every input row to the row holding its coords
        inv = np.asarray(inverse)
        gc, gb = np.asarray(grid.coords), np.asarray(grid.batch)
        for i in range(n):
            j = inv[i]
            assert j >= 0
            np.testing.assert_array_equal(gc[j], pc[i])
            assert gb[j] == pb[i]
        assert np.all(inv[n:] == -1)

    def test_make_grid_dedup(self):
        batch = jnp.zeros(6, dtype=jnp.int32)
        coords = jnp.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 0, 0], [1, 0, 0], [2, 2, 2], [0, 0, 0]],
            dtype=jnp.int32,
        )
        mask = jnp.ones(6, dtype=bool)
        grid, inverse = make_grid(batch, coords, mask)
        assert int(grid.count()) == 3
        inv = np.asarray(inverse)
        assert inv[0] == inv[2] == inv[5]
        assert inv[1] == inv[3]
        assert inv[0] != inv[1] != inv[4]


def dense_from_sparse(batch, coords, feats, shape, batch_size):
    """Scatter sparse voxels into a dense [B, X, Y, Z, C] grid (coords >= 0)."""
    dense = np.zeros((batch_size,) + shape + (feats.shape[-1],), dtype=np.float64)
    for b, c, f in zip(batch, coords, feats):
        dense[b, c[0], c[1], c[2]] = f
    return dense


class TestConvParity:
    @pytest.mark.parametrize("mode", ["fused", "loop"])
    def test_submanifold_conv_matches_dense(self, rng, mode):
        """Stride-1 sparse conv == dense conv evaluated at occupied sites."""
        batch, coords = random_coords(rng, 120, lo=1, hi=9, batch_size=2)
        n = len(batch)
        cap = 192
        cin, cout = 5, 7
        feats = rng.normal(size=(n, cin))
        w = rng.normal(size=(27, cin, cout))

        pb = np.full(cap, 0, dtype=np.int32)
        pc = np.zeros((cap, 3), dtype=np.int32)
        pm = np.zeros(cap, dtype=bool)
        pf = np.zeros((cap, cin), dtype=np.float32)
        pb[:n], pc[:n], pm[:n] = batch, coords, True
        pf[:n] = feats

        grid, inverse = make_grid(jnp.asarray(pb), jnp.asarray(pc), jnp.asarray(pm))
        gf = jnp.zeros((cap, cin), dtype=jnp.float32)
        gf = gf.at[jnp.where(jnp.asarray(pm), inverse, cap)].set(
            jnp.asarray(pf), mode="drop"
        )
        nbr = same_level_map(grid)
        out = np.asarray(sparse_conv(gf, nbr, jnp.asarray(w, dtype=jnp.float32), mode=mode))

        # dense reference: occupancy-gated correlation
        dense = dense_from_sparse(batch, coords, feats, (10, 10, 10), 2)
        gb, gc, gm = np.asarray(grid.batch), np.asarray(grid.coords), np.asarray(grid.mask)
        for i in range(cap):
            if not gm[i]:
                np.testing.assert_allclose(out[i], 0.0, atol=1e-5)
                continue
            acc = np.zeros(cout)
            for k, off in enumerate(KERNEL_OFFSETS_K3):
                q = gc[i] + off
                if np.all(q >= 0) and np.all(q < 10):
                    # only occupied sites contribute (submanifold)
                    occupied = np.any(dense[gb[i], q[0], q[1], q[2]] != 0) or any(
                        (batch[j] == gb[i]) and np.array_equal(coords[j], q)
                        for j in range(n)
                    )
                    if occupied:
                        acc += dense[gb[i], q[0], q[1], q[2]] @ w[k]
            np.testing.assert_allclose(out[i], acc, rtol=1e-4, atol=1e-4)

    def test_downsample_and_strided_conv(self, rng):
        """Stride-2 output coords = unique(floor(c/2)); conv gathers 2c+off."""
        batch, coords = random_coords(rng, 80, lo=-8, hi=8, batch_size=2)
        n = len(batch)
        cap = 128
        pb = np.full(cap, 0, dtype=np.int32)
        pc = np.zeros((cap, 3), dtype=np.int32)
        pm = np.zeros(cap, dtype=bool)
        pb[:n], pc[:n], pm[:n] = batch, coords, True
        fine, _ = make_grid(jnp.asarray(pb), jnp.asarray(pc), jnp.asarray(pm))
        coarse, parent = downsample(fine, capacity=cap)

        # ground-truth coarse set
        gt = {(b, *(c // 2)) for b, c in zip(batch, np.floor_divide(coords, 2))}
        gt2 = {(int(b), int(x), int(y), int(z)) for (b, x, y, z) in
               ((b, *np.floor_divide(c, 2)) for b, c in zip(batch, coords))}
        cm = np.asarray(coarse.mask)
        got = {
            (int(b), int(x), int(y), int(z))
            for b, (x, y, z) in zip(
                np.asarray(coarse.batch)[cm], np.asarray(coarse.coords)[cm]
            )
        }
        assert got == gt2

        # parent map consistency
        par = np.asarray(parent)
        fm = np.asarray(fine.mask)
        fc, fb = np.asarray(fine.coords), np.asarray(fine.batch)
        cc, cb = np.asarray(coarse.coords), np.asarray(coarse.batch)
        for i in range(cap):
            if fm[i]:
                j = par[i]
                assert j >= 0
                np.testing.assert_array_equal(cc[j], np.floor_divide(fc[i], 2))
                assert cb[j] == fb[i]
            else:
                assert par[i] == -1

        # down kernel map: coarse row gathers fine voxels at 2c + off
        dmap = np.asarray(down_map(fine, coarse))
        fkeys = {
            (int(b), int(x), int(y), int(z)): i
            for i, (b, (x, y, z), m) in enumerate(zip(fb, fc, fm))
            if m
        }
        for i in range(cap):
            if not cm[i]:
                assert np.all(dmap[i] == -1)
                continue
            for k, off in enumerate(KERNEL_OFFSETS_K3):
                q = tuple(2 * cc[i] + off)
                expect = fkeys.get((int(cb[i]),) + tuple(int(v) for v in q), -1)
                assert dmap[i, k] == expect

        # up kernel map is the adjoint: fine f sees coarse (f+off)/2
        umap = np.asarray(up_map(fine, coarse))
        # the transpose derivation must agree exactly with the direct lookup
        umap2 = np.asarray(up_map_from_down(down_map(fine, coarse), fine.capacity))
        np.testing.assert_array_equal(umap, umap2)
        # fine-side down-map construction must agree exactly as well
        dmap2 = np.asarray(down_map_fine_side(fine, coarse))
        np.testing.assert_array_equal(np.asarray(down_map(fine, coarse)), dmap2)
        ckeys = {
            (int(b), int(x), int(y), int(z)): i
            for i, (b, (x, y, z), m) in enumerate(zip(cb, cc, cm))
            if m
        }
        for i in range(cap):
            if not fm[i]:
                assert np.all(umap[i] == -1)
                continue
            for k, off in enumerate(KERNEL_OFFSETS_K3):
                cand = fc[i] + off
                if np.all(cand % 2 == 0):
                    expect = ckeys.get(
                        (int(fb[i]),) + tuple(int(v) for v in cand // 2), -1
                    )
                else:
                    expect = -1
                assert umap[i, k] == expect

    def test_adjointness(self, rng):
        """up_map with flipped weights is the transpose of down_map:
        <down(x), y> == <x, up(y)> when up uses W[flip(k)] = W_down[k]^T."""
        batch, coords = random_coords(rng, 60, lo=-6, hi=6, batch_size=2)
        n = len(batch)
        cap = 96
        cin, cout = 4, 6
        pb = np.full(cap, 0, dtype=np.int32)
        pc = np.zeros((cap, 3), dtype=np.int32)
        pm = np.zeros(cap, dtype=bool)
        pb[:n], pc[:n], pm[:n] = batch, coords, True
        fine, _ = make_grid(jnp.asarray(pb), jnp.asarray(pc), jnp.asarray(pm))
        coarse, _ = downsample(fine, capacity=cap)
        dmap = down_map(fine, coarse)
        umap = up_map(fine, coarse)

        w = rng.normal(size=(27, cin, cout)).astype(np.float32)
        x = rng.normal(size=(cap, cin)).astype(np.float32)
        x[~np.asarray(fine.mask)] = 0
        y = rng.normal(size=(cap, cout)).astype(np.float32)
        y[~np.asarray(coarse.mask)] = 0

        down_x = np.asarray(sparse_conv(jnp.asarray(x), dmap, jnp.asarray(w)))
        # offset k in up_map corresponds to down weight at the negated offset;
        # KERNEL_OFFSETS_K3 is symmetric so negation = reversal of the K axis.
        w_t = np.ascontiguousarray(w[::-1].transpose(0, 2, 1))
        up_y = np.asarray(sparse_conv(jnp.asarray(y), umap, jnp.asarray(w_t)))
        np.testing.assert_allclose(
            float(np.sum(down_x * y)), float(np.sum(x * up_y)), rtol=1e-3
        )


class TestJit:
    def test_full_pipeline_jits(self, rng):
        """hierarchy build + convs compile and run under jit with fixed shapes."""

        @jax.jit
        def run(pb, pc, pm, pf, w1, w2):
            grid, inv = make_grid(pb, pc, pm)
            gf = jnp.zeros((pb.shape[0], pf.shape[1]), dtype=pf.dtype)
            gf = gf.at[jnp.where(pm, inv, pb.shape[0])].set(pf, mode="drop")
            nbr = same_level_map(grid)
            h = sparse_conv(gf, nbr, w1)
            coarse, parent = downsample(grid, capacity=pb.shape[0])
            dmap = down_map(grid, coarse)
            h2 = sparse_conv(h, dmap, w2)
            return h, h2, coarse.count()

        batch, coords = random_coords(rng, 100, lo=-10, hi=10)
        cap = 128
        pb = np.zeros(cap, dtype=np.int32)
        pc = np.zeros((cap, 3), dtype=np.int32)
        pm = np.zeros(cap, dtype=bool)
        pb[: len(batch)], pc[: len(batch)], pm[: len(batch)] = batch, coords, True
        pf = rng.normal(size=(cap, 4)).astype(np.float32)
        w1 = rng.normal(size=(27, 4, 8)).astype(np.float32)
        w2 = rng.normal(size=(27, 8, 16)).astype(np.float32)
        h, h2, cnt = run(
            jnp.asarray(pb), jnp.asarray(pc), jnp.asarray(pm),
            jnp.asarray(pf), jnp.asarray(w1), jnp.asarray(w2),
        )
        assert h.shape == (cap, 8)
        assert h2.shape == (cap, 16)
        assert int(cnt) > 0
