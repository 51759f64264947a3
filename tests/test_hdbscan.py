"""On-device density grouping vs sklearn HDBSCAN on synthetic blobs.

VERDICT r1 #4 done-criterion: adjusted-rand > 0.9 against the hdbscan oracle
on synthetic blobs (oracle here is sklearn.cluster.HDBSCAN, same algorithm
family as the reference's Cython ``hdbscan`` package with the reference's
hyperparameters min_cluster_size=15, min_samples=5, epsilon=0.006).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.cluster import HDBSCAN
from sklearn.metrics import adjusted_rand_score

from panopticsegforlargescalepointcloud_tpu.cluster.hdbscan import hdbscan_labels


def make_blobs(rng, n_blobs, pts_per_blob, dim, spread=0.08, sep=1.0):
    centers = rng.normal(size=(n_blobs, dim)) * sep
    pts = []
    for c in centers:
        pts.append(c + rng.normal(size=(pts_per_blob, dim)) * spread)
    x = np.concatenate(pts).astype(np.float32)
    gt = np.repeat(np.arange(n_blobs), pts_per_blob)
    perm = rng.permutation(len(x))
    return x[perm], gt[perm]


def run_ours(x, cap=None, **kw):
    n = len(x)
    cap = cap or n
    pts = np.zeros((1, cap, x.shape[1]), np.float32)
    pts[0, :n] = x
    valid = np.zeros((1, cap), bool)
    valid[0, :n] = True
    res = hdbscan_labels(jnp.asarray(pts), jnp.asarray(valid), **kw)
    return np.asarray(res.labels)[0, :n], int(res.num_clusters[0])


class TestHdbscanParity:
    @pytest.mark.parametrize("seed,n_blobs,dim", [(0, 4, 5), (1, 6, 3), (2, 3, 5)])
    def test_blobs_match_sklearn(self, seed, n_blobs, dim):
        rng = np.random.default_rng(seed)
        x, gt = make_blobs(rng, n_blobs, pts_per_blob=60, dim=dim)
        ours, k = run_ours(x)
        ref = HDBSCAN(min_cluster_size=15, min_samples=5,
                      cluster_selection_epsilon=0.006).fit_predict(x)
        ari_vs_ref = adjusted_rand_score(ref, ours)
        ari_vs_gt = adjusted_rand_score(gt, ours)
        assert ari_vs_ref > 0.9, (ari_vs_ref, k)
        assert ari_vs_gt > 0.9

    def test_single_cluster_matches_sklearn(self):
        # one unbroken lineage: sklearn (allow_single_cluster=False) labels
        # everything noise; eom reproduces that exactly. The cheap "gap"
        # mode instead keeps one cluster (documented divergence).
        rng = np.random.default_rng(3)
        x = rng.normal(size=(150, 5)).astype(np.float32) * 0.05
        ref = HDBSCAN(min_cluster_size=15, min_samples=5,
                      cluster_selection_epsilon=0.006).fit_predict(x)
        assert np.all(ref == -1)
        ours, k = run_ours(x)
        assert k == 0 and np.all(ours == -1)
        ours_gap, k_gap = run_ours(x, selection="gap")
        assert k_gap == 1 and np.all(ours_gap == 0)

    def test_noise_points_match_sklearn(self):
        rng = np.random.default_rng(4)
        x, gt = make_blobs(rng, 3, pts_per_blob=60, dim=3, spread=0.05, sep=2.0)
        # sprinkle far-away isolated points: most are too sparse to cluster
        # (sklearn absorbs a few into the nearest blob's condensed node -
        # eom reproduces exactly that, noise-for-noise)
        noise = rng.uniform(-8, 8, size=(12, 3)).astype(np.float32)
        xa = np.concatenate([x, noise])
        ours, k = run_ours(xa)
        ref = HDBSCAN(min_cluster_size=15, min_samples=5,
                      cluster_selection_epsilon=0.006).fit_predict(xa)
        assert k == 3
        assert adjusted_rand_score(ref, ours) > 0.99
        np.testing.assert_array_equal(ours[len(x):] == -1,
                                      ref[len(x):] == -1)

    def test_padding_and_batching(self):
        rng = np.random.default_rng(5)
        x1, g1 = make_blobs(rng, 2, 40, 4)
        x2, g2 = make_blobs(rng, 5, 40, 4)
        cap = 256
        pts = np.zeros((2, cap, 4), np.float32)
        valid = np.zeros((2, cap), bool)
        pts[0, :len(x1)] = x1
        valid[0, :len(x1)] = True
        pts[1, :len(x2)] = x2
        valid[1, :len(x2)] = True
        res = hdbscan_labels(jnp.asarray(pts), jnp.asarray(valid))
        labs = np.asarray(res.labels)
        assert int(res.num_clusters[0]) == 2
        assert int(res.num_clusters[1]) == 5
        assert np.all(labs[0, len(x1):] == -1)
        assert adjusted_rand_score(g2, labs[1, :len(x2)]) > 0.9

    def test_min_cluster_size_filters(self):
        rng = np.random.default_rng(6)
        x, _ = make_blobs(rng, 2, 10, 3)  # blobs below min_cluster_size=15
        ours, k = run_ours(x, min_cluster_size=15)
        assert k == 0
        ours2, k2 = run_ours(x, min_cluster_size=5)
        assert k2 == 2

    @pytest.mark.parametrize("selection", ["eom", "gap"])
    def test_gap_mode_still_works_on_blobs(self, selection):
        rng = np.random.default_rng(7)
        x, gt = make_blobs(rng, 4, 50, 4)
        ours, k = run_ours(x, selection=selection)
        assert adjusted_rand_score(gt, ours) > 0.9


class TestEomSelection:
    """Cases where the old global-gap cut diverges from real HDBSCAN:
    variable densities and nested structure (VERDICT r2 weak #4)."""

    def _compare(self, x, gt=None, min_ari=0.9, **kw):
        skl = dict(min_cluster_size=kw.get("min_cluster_size", 15),
                   min_samples=kw.get("min_samples", 5),
                   cluster_selection_epsilon=kw.get("epsilon", 0.006))
        ref = HDBSCAN(**skl).fit_predict(x)
        ours, k = run_ours(x, **kw)
        ari = adjusted_rand_score(ref, ours)
        assert ari > min_ari, (ari, k, len(set(ref)) - 1)
        if gt is not None:
            assert adjusted_rand_score(gt, ours) > min_ari
        return ours, ref

    def test_variable_density_blobs(self):
        # one tight cluster + one 10x looser cluster: a single global
        # threshold either shatters the loose one or merges the tight pair
        rng = np.random.default_rng(10)
        a = rng.normal(size=(80, 3)) * 0.02
        b = np.array([1.5, 0, 0]) + rng.normal(size=(80, 3)) * 0.2
        c = np.array([0, 1.5, 0]) + rng.normal(size=(60, 3)) * 0.02
        x = np.concatenate([a, b, c]).astype(np.float32)
        gt = np.repeat([0, 1, 2], [80, 80, 60])
        self._compare(x, gt)

    def test_nested_subclusters(self):
        # two sub-blobs close together inside a sample that also has a far
        # cluster: eom decides split-vs-merge by stability, not a global cut
        rng = np.random.default_rng(11)
        a1 = rng.normal(size=(60, 3)) * 0.03
        a2 = np.array([0.25, 0, 0]) + rng.normal(size=(60, 3)) * 0.03
        b = np.array([4, 4, 0]) + rng.normal(size=(70, 3)) * 0.05
        x = np.concatenate([a1, a2, b]).astype(np.float32)
        self._compare(x, min_ari=0.85)

    def test_trained_embedding_shape(self):
        # discriminative-loss-like geometry: tight pulls, varying pull
        # strength per instance (the "only early in training" happy case
        # the old cut relied on is gone)
        rng = np.random.default_rng(12)
        parts, gt = [], []
        spreads = [0.01, 0.05, 0.12, 0.02, 0.08]
        for i, s in enumerate(spreads):
            c = rng.normal(size=3) * 2.0
            parts.append(c + rng.normal(size=(50, 3)) * s)
            gt.append(np.full(50, i))
        x = np.concatenate(parts).astype(np.float32)
        self._compare(x, np.concatenate(gt), min_ari=0.85)
