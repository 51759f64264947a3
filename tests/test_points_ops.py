"""FPS / kNN / ball query / kNN-interpolate device ops vs numpy brute force
(reference surface: torch-points-kernels ops behind
core/spatial_ops/{sampling_strategies,neighbour_finder}.py and
torch_geometric knn_interpolate)."""

import jax.numpy as jnp
import numpy as np

from panopticsegforlargescalepointcloud_tpu.ops.points import (
    ball_query,
    farthest_point_sample,
    knn,
    knn_interpolate,
)


class TestKnn:
    def test_vs_brute(self, rng):
        q = rng.normal(size=(50, 3)).astype(np.float32)
        r = rng.normal(size=(200, 3)).astype(np.float32)
        rvalid = np.ones(200, bool)
        rvalid[150:] = False
        idx, d2 = knn(jnp.asarray(q), jnp.asarray(r), 5, rvalid=jnp.asarray(rvalid))
        idx, d2 = np.asarray(idx), np.asarray(d2)
        for i in range(len(q)):
            dd = np.linalg.norm(r - q[i], axis=1) ** 2
            dd[~rvalid] = np.inf
            expect = np.argsort(dd)[:5]
            np.testing.assert_allclose(np.sort(d2[i]), np.sort(dd[expect]), rtol=1e-4)
            assert set(idx[i]) == set(expect)

    def test_pads_when_few_refs(self, rng):
        q = rng.normal(size=(4, 3)).astype(np.float32)
        r = rng.normal(size=(2, 3)).astype(np.float32)
        idx, d2 = knn(jnp.asarray(q), jnp.asarray(r), 5)
        assert idx.shape == (4, 5)
        assert np.all(np.asarray(idx)[:, 2:] == -1)


class TestBallQuery:
    def test_radius_filter(self, rng):
        q = rng.uniform(0, 2, (30, 3)).astype(np.float32)
        r = rng.uniform(0, 2, (100, 3)).astype(np.float32)
        rad = 0.5
        idx, d2 = ball_query(jnp.asarray(q), jnp.asarray(r), rad, 16)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        for i in range(len(q)):
            dd = np.linalg.norm(r - q[i], axis=1)
            inside = set(np.where(dd <= rad)[0].tolist())
            got = set(idx[i][idx[i] >= 0].tolist())
            # returned set = the min(k, |inside|) nearest inside points
            assert got <= inside
            if len(inside) <= 16:
                assert got == inside
            assert np.all(d2[i][idx[i] >= 0] <= rad * rad + 1e-6)


class TestFps:
    def test_spread_and_determinism(self, rng):
        # 4 well-separated clusters: 4 FPS samples must hit all 4
        centers = np.array(
            [[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]], np.float32
        )
        pts = np.concatenate(
            [c + 0.1 * rng.normal(size=(50, 3)).astype(np.float32) for c in centers]
        )
        sel = np.asarray(farthest_point_sample(jnp.asarray(pts), 4))
        got_clusters = set((sel // 50).tolist())
        assert got_clusters == {0, 1, 2, 3}
        sel2 = np.asarray(farthest_point_sample(jnp.asarray(pts), 4))
        np.testing.assert_array_equal(sel, sel2)

    def test_respects_valid(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        valid = np.zeros(100, bool)
        valid[10:20] = True
        sel = np.asarray(
            farthest_point_sample(jnp.asarray(pts), 5, jnp.asarray(valid))
        )
        assert np.all((sel >= 10) & (sel < 20))


class TestKnnInterpolate:
    def test_exact_at_source_points(self, rng):
        src = rng.normal(size=(40, 3)).astype(np.float32)
        f = rng.normal(size=(40, 8)).astype(np.float32)
        out = np.asarray(
            knn_interpolate(jnp.asarray(f), jnp.asarray(src), jnp.asarray(src), k=3)
        )
        np.testing.assert_allclose(out, f, rtol=1e-3, atol=1e-4)

    def test_weighted_average(self, rng):
        # destination midway between two sources gets their mean
        src = np.array([[0, 0, 0], [2, 0, 0], [100, 100, 100]], np.float32)
        f = np.array([[1.0], [3.0], [99.0]], np.float32)
        dst = np.array([[1, 0, 0]], np.float32)
        out = np.asarray(
            knn_interpolate(jnp.asarray(f), jnp.asarray(src), jnp.asarray(dst), k=2)
        )
        np.testing.assert_allclose(out, [[2.0]], rtol=1e-5)
