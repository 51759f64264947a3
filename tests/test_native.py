"""Native grid-hash library tests vs numpy/scipy ground truth."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from panopticsegforlargescalepointcloud_tpu.ops.native import (
    Grid2D,
    available,
    knn1,
    voxel_sample_last,
)

pytestmark = pytest.mark.skipif(not available(), reason="g++ unavailable")


class TestNative:
    def test_voxel_sample_last(self, rng):
        pos = (rng.random((2000, 3)) * 5).astype(np.float32)
        perm = rng.permutation(2000)
        sel, inv = voxel_sample_last(pos, 0.25, perm)
        # one representative per voxel
        q = np.round(pos[sel] / 0.25).astype(int)
        keys = q[:, 0] * 10_000_00 + q[:, 1] * 1000 + q[:, 2]
        assert len(np.unique(keys)) == len(sel)
        # inv maps every point to its representative's voxel
        qa = np.round(pos / 0.25).astype(int)
        for i in rng.integers(0, 2000, 100):
            np.testing.assert_array_equal(qa[i], q[inv[i]])

    def test_cylinder_query(self, rng):
        pos = (rng.random((3000, 3)) * 20).astype(np.float32)
        g = Grid2D(pos[:, :2], cell=2.0)
        for _ in range(10):
            c = rng.random(2) * 20
            got = set(g.cylinder_query(c[0], c[1], 3.0).tolist())
            d = np.linalg.norm(pos[:, :2] - c, axis=1)
            expect = set(np.where(d <= 3.0)[0].tolist())
            assert got == expect

    def test_knn1_vs_scipy(self, rng):
        ref = (rng.random((2000, 3)) * 10).astype(np.float32)
        query = (rng.random((500, 3)) * 10).astype(np.float32)
        idx, dist = knn1(ref, query)
        tree = cKDTree(ref)
        d2, i2 = tree.query(query, k=1)
        np.testing.assert_allclose(dist, d2, rtol=1e-5)
        np.testing.assert_array_equal(idx, i2)

    def test_knn1_ring0_hit_is_not_terminal(self):
        """Regression (ADVICE r1): a same-cell hit at ~sqrt(3)*cell must not
        stop the search before a closer point two rings out is seen."""
        ref = np.array([[0, 0, 0], [2, 0.99, 0.99]], np.float32)
        query = np.array([[0.99, 0.99, 0.99]], np.float32)
        idx, dist = knn1(ref, query, cell=1.0)
        assert idx[0] == 1
        np.testing.assert_allclose(dist[0], 1.01, rtol=1e-5)

    def test_knn1_exact_indices_across_cells(self, rng):
        for cell in (0.05, 0.5, 2.0):
            ref = rng.normal(size=(1500, 3)).astype(np.float32)
            query = (rng.normal(size=(300, 3)) * 2).astype(np.float32)
            idx, dist = knn1(ref, query, cell=cell)
            d2, i2 = cKDTree(ref).query(query, k=1)
            np.testing.assert_array_equal(idx, i2)
