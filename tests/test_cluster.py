"""Clustering tests: radius neighbors vs brute force, region grow vs
scipy connected components, mean-shift vs sklearn on synthetic blobs."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import connected_components

from panopticsegforlargescalepointcloud_tpu.cluster import (
    mean_shift,
    radius_neighbors,
    region_grow,
    region_grow_folded,
)
from panopticsegforlargescalepointcloud_tpu.cluster.meanshift import pack_by_sample


class TestRadiusNeighbors:
    def test_vs_brute_force(self, rng):
        n = 200
        pos = rng.random((n, 3)).astype(np.float32) * 4
        batch = rng.integers(0, 2, size=n).astype(np.int32)
        valid = np.ones(n, bool)
        valid[-20:] = False
        r = 0.5
        nbr, d2 = radius_neighbors(
            jnp.asarray(pos), jnp.asarray(batch), jnp.asarray(valid), r,
            k=64, cell_cap=64,
        )
        nbr = np.asarray(nbr)
        for i in range(n):
            got = set(nbr[i][nbr[i] >= 0].tolist())
            if not valid[i]:
                assert not got
                continue
            dd = np.linalg.norm(pos - pos[i], axis=1)
            expect = set(
                np.where((dd <= r) & (batch == batch[i]) & valid)[0].tolist()
            )
            assert got == expect, f"row {i}: {got ^ expect}"


class TestPerSampleCellShift:
    def test_distant_absolute_frames(self, rng):
        # ADVICE r2: two samples ~5 km apart in one batch. With a global-min
        # cell shift, sample 1's cell coords would overflow the 9-bit axis
        # budget (512 cells * 0.5 m), its keys would pack INVALID, and its
        # rows would silently get zero neighbors. Per-sample shifting keeps
        # both frames in budget; only the per-sample extent matters.
        n_half = 100
        base = rng.random((n_half, 3)).astype(np.float32) * 4
        pos = np.concatenate([base, base + np.float32(5000.0)])
        batch = np.repeat(np.array([0, 1], np.int32), n_half)
        valid = np.ones(2 * n_half, bool)
        r = 0.5
        nbr, _ = radius_neighbors(
            jnp.asarray(pos), jnp.asarray(batch), jnp.asarray(valid), r,
            k=64, cell_cap=64,
        )
        nbr = np.asarray(nbr)
        # identical local geometry => identical neighbor sets (mod the offset)
        for i in range(n_half):
            near = set(nbr[i][nbr[i] >= 0].tolist())
            far = set((nbr[n_half + i][nbr[n_half + i] >= 0] - n_half).tolist())
            assert far == near, f"row {i}: {far ^ near}"
            dd = np.linalg.norm(base - base[i], axis=1)
            assert near == set(np.where(dd <= r)[0].tolist())


class TestFoldedIdCellShift:
    def test_folded_ids_past_default_table(self, rng):
        """ADVICE r3 (medium): region_grow_folded folds ids as
        batch * num_classes + class, which can exceed the default 256-slot
        per-id min table; those ids must NOT collapse into a union-extent
        shift (distant frames would overflow keys -> zero neighbors ->
        spurious singleton components)."""
        num_classes = 9
        num_samples = 40  # folded ids up to 360 > 256
        n_half = 60
        # grid-quantized coords: pairwise d2 are multiples of 0.0625, all
        # >= 0.015 from r2 = 0.64, so the float32 error of the +5000 m frame
        # shift (~3e-3 in d2 after subtraction) cannot flip edge membership
        base = (rng.integers(0, 9, (n_half, 3)) * 0.25).astype(np.float32)
        # sample 39 sits 5 km away from sample 0; same local geometry
        pos = np.concatenate([base, base + np.float32(5000.0)])
        batch = np.repeat(np.array([0, num_samples - 1], np.int32), n_half)
        sem = np.full(2 * n_half, num_classes - 1, np.int32)  # folded id 359
        grow = np.ones(2 * n_half, bool)
        res = region_grow_folded(
            jnp.asarray(pos), jnp.asarray(sem), jnp.asarray(batch),
            jnp.asarray(grow), radius=0.8, max_proposals=32,
            num_classes=num_classes, num_samples=num_samples,
            min_cluster_size=2, k_neighbors=16, cell_cap=16,
        )
        pp = np.asarray(res.point_prop)
        # the far sample must cluster exactly like the near one
        a, b = pp[:n_half], pp[n_half:]
        assert (a >= 0).any()
        assert ((a >= 0) == (b >= 0)).all()
        ra = {x: i for i, x in enumerate(dict.fromkeys(a[a >= 0]))}
        rb = {x: i for i, x in enumerate(dict.fromkeys(b[b >= 0]))}
        assert [ra[x] for x in a[a >= 0]] == [rb[x] for x in b[b >= 0]]

    def test_radius_query_distant_frames(self, rng):
        """ADVICE r3 (low): cross-set radius_query must shift cells per id
        over query ∪ support, not by one union min - samples in distant
        absolute frames otherwise overflow silently."""
        from panopticsegforlargescalepointcloud_tpu.cluster.neighbors import (
            radius_query,
        )

        n_half = 50
        # quantized coords: see test_folded_ids_past_default_table
        qb = (rng.integers(0, 12, (n_half, 3)) * 0.25).astype(np.float32)
        sb = (rng.integers(0, 12, (n_half, 3)) * 0.25).astype(np.float32)
        q_pos = np.concatenate([qb, qb + np.float32(5000.0)])
        s_pos = np.concatenate([sb, sb + np.float32(5000.0)])
        ids = np.repeat(np.array([0, 1], np.int32), n_half)
        ok = np.ones(2 * n_half, bool)
        r = 0.6
        idx, _ = radius_query(
            jnp.asarray(q_pos), jnp.asarray(ids), jnp.asarray(ok),
            jnp.asarray(s_pos), jnp.asarray(ids), jnp.asarray(ok),
            radius=r, k=32, cell_cap=32,
        )
        idx = np.asarray(idx)
        for i in range(n_half):
            near = set(idx[i][idx[i] >= 0].tolist())
            far = set((idx[n_half + i][idx[n_half + i] >= 0] - n_half).tolist())
            assert far == near, f"row {i}: {far ^ near}"
            dd = np.linalg.norm(sb - qb[i], axis=1)
            assert near == set(np.where(dd <= r)[0].tolist())


class TestRegionGrow:
    def make_scene(self, rng, n=300):
        pos = rng.random((n, 3)).astype(np.float32) * 6
        batch = rng.integers(0, 2, size=n).astype(np.int32)
        sem = rng.integers(0, 3, size=n).astype(np.int32)
        mask = np.ones(n, bool)
        mask[-30:] = False
        # exclude class 0 as "stuff"
        grow = mask & (sem != 0)
        return pos, batch, sem, mask, grow

    def scipy_components(self, pos, batch, sem, grow, r):
        n = len(pos)
        idx = np.where(grow)[0]
        rows, cols = [], []
        for a in idx:
            for b in idx:
                if (
                    a != b
                    and batch[a] == batch[b]
                    and sem[a] == sem[b]
                    and np.linalg.norm(pos[a] - pos[b]) <= r
                ):
                    rows.append(a)
                    cols.append(b)
        g = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
        ncomp, lab = connected_components(g, directed=False)
        return lab

    @pytest.mark.parametrize("min_size", [1, 5])
    def test_vs_scipy(self, rng, min_size):
        pos, batch, sem, mask, grow = self.make_scene(rng)
        r = 0.6
        res = region_grow(
            jnp.asarray(pos), jnp.asarray(sem), jnp.asarray(batch),
            jnp.asarray(grow), radius=r, max_proposals=300,
            min_cluster_size=min_size, k_neighbors=64, cell_cap=64,
        )
        got = np.asarray(res.point_prop)
        lab = self.scipy_components(pos, batch, sem, grow, r)
        # build expected grouping (components of grow points, size >= min)
        comp_sizes = {}
        for i in np.where(grow)[0]:
            comp_sizes[lab[i]] = comp_sizes.get(lab[i], 0) + 1
        expect_grouped = {}
        for i in np.where(grow)[0]:
            if comp_sizes[lab[i]] >= min_size:
                expect_grouped.setdefault(lab[i], set()).add(i)
        # got grouping
        got_grouped = {}
        for i in range(len(pos)):
            if got[i] >= 0:
                got_grouped.setdefault(got[i], set()).add(i)
        assert set(map(frozenset, got_grouped.values())) == set(
            map(frozenset, expect_grouped.values())
        )
        # non-grow points must not be clustered
        assert np.all(got[~grow] == -1)
        # prop_batch consistent
        pb = np.asarray(res.prop_batch)
        for pid, members in got_grouped.items():
            assert all(batch[m] == pb[pid] for m in members)

    def test_folded_matches_postfilter(self, rng):
        """region_grow_folded (class in the cell key) groups identically to
        region_grow (post-hoc class filter) when budgets don't bind."""
        pos, batch, sem, mask, grow = self.make_scene(rng)
        r = 0.6
        kw = dict(radius=r, max_proposals=300, min_cluster_size=1,
                  k_neighbors=64, cell_cap=64)
        a = region_grow(
            jnp.asarray(pos), jnp.asarray(sem), jnp.asarray(batch),
            jnp.asarray(grow), **kw,
        )
        b = region_grow_folded(
            jnp.asarray(pos), jnp.asarray(sem), jnp.asarray(batch),
            jnp.asarray(grow), num_classes=3, num_samples=2, **kw,
        )

        def groups(point_prop):
            g = {}
            for i, p in enumerate(np.asarray(point_prop)):
                if p >= 0:
                    g.setdefault(int(p), set()).add(i)
            return set(map(frozenset, g.values()))

        assert groups(a.point_prop) == groups(b.point_prop)

    def test_point_cap_compaction(self, rng):
        """rg_point_cap compacts eligible rows before the graph: identical
        partitions when the cap covers all thing rows, and an exact overflow
        count (dropped tail rows only) when it binds (VERDICT r2 task 1)."""
        pos, batch, sem, mask, grow = self.make_scene(rng)
        kw = dict(radius=0.6, max_proposals=300, min_cluster_size=1,
                  num_classes=3, num_samples=2, k_neighbors=64, cell_cap=64)
        args = (jnp.asarray(pos), jnp.asarray(sem), jnp.asarray(batch),
                jnp.asarray(grow))
        a = region_grow_folded(*args, **kw)
        n_grow = int(grow.sum())
        b = region_grow_folded(*args, point_cap=n_grow + 8, **kw)
        assert int(b.overflow) == 0

        def groups(point_prop):
            g = {}
            for i, p in enumerate(np.asarray(point_prop)):
                if p >= 0:
                    g.setdefault(int(p), set()).add(i)
            return set(map(frozenset, g.values()))

        assert groups(a.point_prop) == groups(b.point_prop)

        cap = n_grow - 7
        c = region_grow_folded(*args, point_cap=cap, **kw)
        assert int(c.overflow) == 7
        # compaction is stable: exactly the LAST 7 eligible rows are dropped
        kept_rows = np.where(grow)[0][:cap]
        dropped_rows = np.where(grow)[0][cap:]
        pc = np.asarray(c.point_prop)
        assert np.all(pc[dropped_rows] == -1)
        # kept rows cluster exactly as a full run restricted to them
        got = {i for i in kept_rows if pc[i] >= 0}
        full = np.asarray(a.point_prop)
        want = {i for i in kept_rows if full[i] >= 0}
        # dropping tail rows can only shrink components below min size, not
        # grow them; with min_cluster_size=1 membership must be preserved
        assert got == want


class TestMeanShift:
    def test_blobs_vs_sklearn(self, rng):
        from sklearn.cluster import MeanShift

        # 3 well-separated blobs in 5-D per sample
        b, npts, e = 2, 120, 5
        data = np.zeros((b, npts, e), np.float32)
        valid = np.zeros((b, npts), bool)
        true_labels = np.zeros((b, npts), np.int64)
        for s in range(b):
            centers = rng.normal(size=(3, e)) * 4.0
            n_valid = 100 if s == 0 else 90
            pts, tl = [], []
            for ci in range(3):
                k = n_valid // 3
                pts.append(centers[ci] + 0.15 * rng.normal(size=(k, e)))
                tl += [ci] * k
            pts = np.concatenate(pts).astype(np.float32)
            data[s, : len(pts)] = pts
            valid[s, : len(pts)] = True
            true_labels[s, : len(pts)] = tl

        bw = 0.6
        res = mean_shift(jnp.asarray(data), jnp.asarray(valid), bandwidth=bw)
        labels = np.asarray(res.labels)
        for s in range(b):
            v = valid[s]
            ours = labels[s][v]
            assert np.all(ours >= 0)
            ref = MeanShift(bandwidth=bw, bin_seeding=True).fit(data[s][v]).labels_
            # same partition (up to relabeling)
            def canon(lab):
                groups = {}
                for i, l in enumerate(lab):
                    groups.setdefault(l, set()).add(i)
                return set(map(frozenset, groups.values()))

            assert canon(ours) == canon(ref)
            assert int(res.num_clusters[s]) == len(set(ref.tolist()))

    def test_pack_by_sample(self, rng):
        n, b, cap, e = 50, 3, 32, 4
        x = rng.normal(size=(n, e)).astype(np.float32)
        batch = rng.integers(0, b, size=n).astype(np.int32)
        mask = rng.random(n) > 0.2
        dense, dvalid, src, dropped = pack_by_sample(
            jnp.asarray(x), jnp.asarray(batch), jnp.asarray(mask), b, cap
        )
        assert int(dropped) == sum(
            max(0, int((mask & (batch == s)).sum()) - cap) for s in range(b)
        )
        dense, dvalid, src = map(np.asarray, (dense, dvalid, src))
        for s in range(b):
            rows = np.where(mask & (batch == s))[0]
            got_rows = src[s][dvalid[s]]
            assert set(got_rows.tolist()) == set(rows.tolist())
            for slot in np.where(dvalid[s])[0]:
                np.testing.assert_array_equal(dense[s, slot], x[src[s, slot]])
        assert np.all(src[~dvalid] == -1)
