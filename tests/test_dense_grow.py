"""Dense MXU min-pull region growing (cluster/dense_grow.py): the pull vs a
numpy brute-force oracle, pallas (interpret) vs the XLA formulation, full
component convergence, and region_grow_folded(dense_pull=True) vs the edge
path on clustered data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panopticsegforlargescalepointcloud_tpu.cluster.dense_grow import (
    _operands,
    dense_components,
    min_pull_pallas,
    min_pull_xla,
    supports_dense,
)
from panopticsegforlargescalepointcloud_tpu.cluster.region_grow import (
    region_grow_folded,
)

BQ, BS = 256, 2048


RADIUS = 0.51  # with grid-quantized coords (step 0.25), pair d2 values are
# 0.0625*k: the boundary r2=0.2601 sits 0.0101 from the nearest k=4, so the
# f32 matmul-form distance fuzz (~4e-5 at |p|^2<=48) can never flip a pair


def make_points(rng, t, n_ids=4):
    """Grid-quantized random points: no pair distance near RADIUS (see
    above), making the adjacency - and thus the oracle comparison - exact."""
    pos = (0.25 * rng.integers(-16, 17, size=(t, 3))).astype(np.float32)
    ids = rng.integers(0, n_ids, t).astype(np.int32)
    valid = rng.random(t) > 0.08
    return pos, ids, valid


def oracle_pull(pos, ids, valid, labels, radius):
    d2 = np.sum((pos[:, None] - pos[None, :]) ** 2, axis=-1)
    ok = (
        (d2 <= radius * radius)
        & (ids[:, None] == ids[None, :])
        & valid[:, None]
        & valid[None, :]
    )
    out = np.full(len(pos), np.inf, np.float32)
    for i in range(len(pos)):
        if ok[i].any():
            out[i] = labels[ok[i]].min()
    return out


class TestMinPull:
    def test_matches_oracle_and_xla(self, rng):
        t, r = BS, RADIUS
        pos, ids, valid = make_points(rng, t)
        labels = rng.permutation(t).astype(np.float32)
        qmat, smat = _operands(jnp.asarray(pos), jnp.asarray(valid))
        got_p = np.asarray(
            min_pull_pallas(qmat, smat, jnp.asarray(ids),
                            jnp.asarray(labels), r * r, bq=BQ, bs=BS)
        )
        got_x = np.asarray(
            min_pull_xla(qmat, smat, jnp.asarray(ids),
                         jnp.asarray(labels), r * r, bq=BQ)
        )
        want = oracle_pull(pos, ids, valid, labels, r)
        np.testing.assert_array_equal(got_p, want)
        np.testing.assert_array_equal(got_x, want)

    def test_supports_dense(self):
        assert supports_dense(20480)
        assert supports_dense(49152)
        assert not supports_dense(1000)
        assert not supports_dense(2048 + 256)


class TestDenseComponents:
    def test_converges_to_components(self, rng):
        """Planted blobs: every point must carry its component's min row."""
        t, r = BS, 0.4
        k = 6
        # centers >= 8 apart: blob random walks extend ~1.1, so no
        # cross-blob pair comes anywhere near the radius boundary (the f32
        # matmul-form distance differs from the oracle's difference form by
        # ~1e-5 at the boundary - keep decisions away from it)
        centers = (8.0 * np.stack(
            [np.arange(k), np.zeros(k), np.zeros(k)], axis=1
        )).astype(np.float32)
        pos = np.zeros((t, 3), np.float32)
        per = t // k
        for i, c in enumerate(centers):
            # dense chain inside each blob: consecutive points ~0.1 apart
            steps = rng.normal(scale=0.06, size=(per, 3)).astype(np.float32)
            pos[i * per : (i + 1) * per] = c + np.cumsum(steps, axis=0)
        ids = np.zeros(t, np.int32)
        valid = np.ones(t, bool)
        init = jnp.arange(t, dtype=jnp.int32)
        labels = np.asarray(
            jax.jit(
                lambda p, i, v, s: dense_components(p, i, v, r, s)
            )(jnp.asarray(pos), jnp.asarray(ids), jnp.asarray(valid), init)
        )
        # oracle components by BFS over the exact radius graph
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import connected_components

        d2 = np.sum((pos[:, None] - pos[None, :]) ** 2, axis=-1)
        adj = csr_matrix(d2 <= r * r)
        _, comp = connected_components(adj, directed=False)
        # same partition, and each label is its component's min row
        for c in np.unique(comp):
            rows = np.where(comp == c)[0]
            assert np.all(labels[rows] == rows.min())


class TestRegionGrowDense:
    def test_matches_edge_path(self, rng):
        """region_grow_folded(dense_pull=True) == the edge path bit-for-bit
        on separated clusters (generous edge budgets so both are exact)."""
        n, r = 3000, 0.5
        k = 5
        pos = np.zeros((n, 3), np.float32)
        sem = rng.integers(1, 3, n).astype(np.int32)
        batch = rng.integers(0, 2, n).astype(np.int32)
        # separated centers: intra-blob connectivity is dense (sigma 0.12
        # <= r/4) and cross-blob distances >= 2, so neither path's radius
        # boundary fuzz can flip a component decision
        centers = (2.5 * np.stack(
            [np.arange(k), np.arange(k) % 2, np.zeros(k)], axis=1
        )).astype(np.float32)
        blob = rng.integers(0, k, n)
        for i in range(k):
            m = blob == i
            pos[m] = centers[i] + rng.normal(scale=0.12, size=(m.sum(), 3))
        grow = rng.random(n) > 0.1
        kw = dict(
            radius=r, max_proposals=64, num_classes=3, num_samples=2,
            min_cluster_size=5, k_neighbors=48, cell_cap=48,
            point_cap=2048,
        )
        args = (jnp.asarray(pos), jnp.asarray(sem), jnp.asarray(batch),
                jnp.asarray(grow))
        edge = jax.jit(
            lambda *a: region_grow_folded(*a, **kw, dense_pull=False)
        )(*args)
        dense = jax.jit(
            lambda *a: region_grow_folded(*a, **kw, dense_pull=True)
        )(*args)
        np.testing.assert_array_equal(
            np.asarray(dense.point_prop), np.asarray(edge.point_prop)
        )
        np.testing.assert_array_equal(
            np.asarray(dense.prop_valid), np.asarray(edge.prop_valid)
        )
        np.testing.assert_array_equal(
            np.asarray(dense.prop_batch), np.asarray(edge.prop_batch)
        )
        assert int(dense.graph_trunc) == 0
        # same overflow accounting (the cap binds identically)
        assert int(dense.overflow) == int(edge.overflow)

    def test_cap_overflow_counted(self, rng):
        n, r = 4096, 0.5
        pos = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
        sem = np.ones(n, np.int32)
        batch = np.zeros(n, np.int32)
        grow = np.ones(n, bool)
        out = region_grow_folded(
            jnp.asarray(pos), jnp.asarray(sem), jnp.asarray(batch),
            jnp.asarray(grow), radius=r, max_proposals=64, num_classes=3,
            num_samples=1, min_cluster_size=5, point_cap=2048,
            dense_pull=True,
        )
        assert int(out.overflow) == n - 2048
