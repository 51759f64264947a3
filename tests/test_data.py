"""Data layer tests: PLY io roundtrip, voxelization semantics, label prep,
dataset sampling and test tiling on a synthetic forest written to disk."""

import os

import numpy as np
import pytest

from panopticsegforlargescalepointcloud_tpu.data import (
    TREEINS_SPEC,
    PanopticFileDataset,
    collate_tiles,
    grid_sample,
    read_ply,
    read_treeins_format,
    set_extra_labels,
    write_ply,
)


class TestPly:
    @pytest.mark.parametrize("text", [False, True])
    def test_roundtrip(self, tmp_path, rng, text):
        n = 100
        pos = rng.random((n, 3)).astype(np.float32)
        sem = rng.integers(0, 3, n).astype(np.int32)
        tree = rng.integers(-1, 5, n).astype(np.int32)
        path = str(tmp_path / "t.ply")
        write_ply(path, [pos, sem, tree], ["x", "y", "z", "semantic_seg", "treeID"], text=text)
        data = read_ply(path)
        rtol = 1e-5 if text else 1e-7  # ascii writes %g (6 sig digits)
        np.testing.assert_allclose(data["x"], pos[:, 0], rtol=rtol)
        np.testing.assert_array_equal(data["semantic_seg"], sem)
        np.testing.assert_array_equal(data["treeID"], tree)


class TestVoxelize:
    def test_last_mode_one_per_voxel(self, rng):
        pos = rng.random((500, 3)).astype(np.float32) * 2
        y = rng.integers(0, 3, 500).astype(np.int64)
        out_pos, out = grid_sample(pos, {"y": y}, 0.5, mode="last", rng=rng)
        keys = np.round(out_pos / 0.5).astype(int)
        k = keys[:, 0] * 10000 + keys[:, 1] * 100 + keys[:, 2]
        assert len(np.unique(k)) == len(k)
        # representative carries its own label
        assert set(np.unique(out["y"])) <= set(np.unique(y))

    def test_mean_mode_majority_labels(self):
        pos = np.array([[0.0, 0, 0], [0.01, 0, 0], [0.02, 0, 0], [1.0, 0, 0]], np.float32)
        y = np.array([2, 2, 1, 0], np.int64)
        out_pos, out = grid_sample(pos, {"y": y}, 0.5, mode="mean")
        assert len(out_pos) == 2
        i0 = np.argmin(out_pos[:, 0])
        assert out["y"][i0] == 2  # majority
        np.testing.assert_allclose(out_pos[i0, 0], 0.01, atol=1e-6)


class TestLabels:
    def test_set_extra_labels(self):
        pos = np.array([[0.0, 0, 0], [2, 0, 0], [10, 0, 0], [12, 0, 0], [5, 5, 0]], np.float32)
        y = np.array([1, 1, 1, 1, 0])
        inst = np.array([4, 4, 9, 9, 3])
        out = set_extra_labels(pos, y, inst, thing_classes=(1,))
        assert out["num_instances"] == 2
        assert out["instance_labels"][0] == out["instance_labels"][1] != 0
        assert out["instance_labels"][2] == out["instance_labels"][3] != 0
        assert out["instance_labels"][4] == 0  # stuff instance excluded
        np.testing.assert_allclose(out["vote_label"][0], [1, 0, 0])
        np.testing.assert_allclose(out["vote_label"][1], [-1, 0, 0])


def make_forest_ply(path, rng, n_trees=5, extent=20.0):
    pts, sem, tid = [], [], []
    for t in range(n_trees):
        c = rng.uniform(2, extent - 2, 2)
        k = 200
        xy = c + rng.normal(scale=0.5, size=(k, 2))
        z = rng.uniform(0, 10, (k, 1))
        pts.append(np.concatenate([xy, z], 1))
        sem.append(np.full(k, 2))  # raw 'tree' = 2 -> shifted 1
        tid.append(np.full(k, t))
    k = 2000
    ground = np.stack(
        [rng.uniform(0, extent, k), rng.uniform(0, extent, k), rng.normal(scale=0.05, size=k)], 1
    )
    pts.append(ground)
    sem.append(np.full(k, 1))  # raw 'non-tree' = 1 -> shifted 0
    tid.append(np.full(k, -1))
    pos = np.concatenate(pts).astype(np.float32)
    write_ply(
        path,
        [pos, np.concatenate(sem).astype(np.int32), np.concatenate(tid).astype(np.int32)],
        ["x", "y", "z", "semantic_seg", "treeID"],
    )
    return pos


class TestDataset:
    def test_treeins_end_to_end(self, tmp_path, rng):
        ply = str(tmp_path / "forest.ply")
        make_forest_ply(ply, rng)
        pos, y, inst = read_treeins_format(ply)
        assert set(np.unique(y)) <= {0, 1}
        assert inst.min() >= 0

        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=4.0,
            processed_dir=str(tmp_path / "proc"), rng=rng,
        )
        tile = ds.sample_train_tile(rng)
        assert (tile["y"] == 1).any()  # has tree
        assert tile["num_instances"] >= 1
        assert tile["coords"].dtype == np.int32
        assert tile["feats"].shape[1] == 4
        assert len(tile["pos"]) == len(tile["coords"])
        # vote labels point toward instance centers: mean |vote| < tile size
        vm = np.abs(tile["vote_label"]).max()
        assert vm < 12

        vb = collate_tiles([tile], capacity=8192, num_tiles=1)
        assert vb.mask.sum() == len(tile["pos"])

        tiles = ds.test_tiles(0)
        assert len(tiles) >= 4
        covered = np.unique(np.concatenate([t[1] for t in tiles]))
        # grid tiling covers every subsampled point at least once
        assert len(covered) == len(ds.clouds[0]["pos"])
        # cached reload
        ds2 = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=4.0,
            processed_dir=str(tmp_path / "proc"), rng=rng,
        )
        assert len(ds2.clouds[0]["pos"]) == len(ds.clouds[0]["pos"])


class TestSphereSampling:
    def test_sphere_membership_and_coverage(self, tmp_path, rng):
        """sampling_format=sphere (reference TreeinsSphere,
        segmentation/treeins.py:461-563 selected at :638-639): tiles are
        true 3D balls and the test tiling covers the whole cloud."""
        ply = str(tmp_path / "forest.ply")
        make_forest_ply(ply, rng, n_trees=4, extent=12.0)
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=4.0,
            sampling_format="sphere", rng=rng,
        )
        t = ds._query_tile(0, np.array([5.0, 5.0, 2.0]))
        d = np.linalg.norm(t["pos"] - np.array([5.0, 5.0, 2.0]), axis=1)
        assert len(t["pos"]) > 0
        assert (d <= 4.0 + 1e-6).all()

        tile = ds.sample_train_tile(rng)
        assert (tile["y"] == 1).any()  # treeins rejects tree-less tiles

        tiles = ds.test_tiles(0)
        cover = np.unique(np.concatenate([ids for _, ids in tiles]))
        assert len(cover) == len(ds.clouds[0]["pos"])


class TestReferencePlyCompat:
    def test_eval_ply_header_and_roundtrip(self, tmp_path, rng):
        """to_eval_ply matches the reference exporter format exactly (ASCII,
        x/y/z float + preds/gt int16 - reference datasets/panoptic/
        treeins.py:59-75 writes via plyfile with text=True)."""
        from panopticsegforlargescalepointcloud_tpu.data.ply import (
            read_ply,
            to_eval_ply,
            to_ins_ply,
        )

        pos = rng.normal(size=(50, 3)).astype(np.float32)
        preds = rng.integers(-1, 9, 50)
        gt = rng.integers(-1, 9, 50)
        p = str(tmp_path / "sem.ply")
        to_eval_ply(p, pos, preds, gt)
        header = open(p, "rb").read().split(b"end_header")[0].decode()
        assert "format ascii 1.0" in header
        for line in ["property float x", "property float y", "property float z",
                     "property short preds", "property short gt"]:
            assert line in header, line
        back = read_ply(p)
        np.testing.assert_allclose(back["x"], pos[:, 0], rtol=1e-6)
        np.testing.assert_array_equal(back["preds"], preds.astype(np.int16))
        np.testing.assert_array_equal(back["gt"], gt.astype(np.int16))

        pc = str(tmp_path / "col.ply")
        to_ins_ply(pc, pos, rng.integers(0, 5, 50))
        h2 = open(pc, "rb").read().split(b"end_header")[0].decode()
        for line in ["property uchar red", "property uchar green",
                     "property uchar blue"]:
            assert line in h2, line


class TestLegacyTransforms:
    """elastic/dropout/crop/density transforms (reference
    core/data_transform/transforms.py:761-1096, grid_transform.py:335-397)."""

    def test_elastic_distortion_smooth_and_bounded(self, rng):
        from panopticsegforlargescalepointcloud_tpu.data.transforms import (
            elastic_distortion,
        )

        pos = rng.uniform(0, 4, (2000, 3)).astype(np.float32)
        out = elastic_distortion(pos, rng, apply_prob=1.0)
        assert out.shape == pos.shape
        disp = np.linalg.norm(out - pos, axis=1)
        assert disp.max() > 0  # actually displaces
        assert disp.max() < 4.0  # bounded by magnitudes
        # smoothness: nearby points move together
        d = np.linalg.norm(pos - pos[0], axis=1)
        close = d < 0.05
        if close.sum() > 1:
            rel = (out[close] - pos[close]) - (out[0] - pos[0])
            assert np.linalg.norm(rel, axis=1).max() < 0.25

    def test_random_dropout(self, rng):
        from panopticsegforlargescalepointcloud_tpu.data.transforms import (
            random_dropout,
        )

        keep = random_dropout(1000, rng, dropout_ratio=0.3, apply_prob=1.0)
        assert len(keep) == 700
        assert len(np.unique(keep)) == 700
        keep2 = random_dropout(1000, rng, dropout_ratio=0.3, apply_prob=0.0)
        assert len(keep2) == 1000

    def test_sphere_and_cube_crop(self, rng):
        from panopticsegforlargescalepointcloud_tpu.data.transforms import (
            cube_crop,
            sphere_crop,
        )

        pos = rng.uniform(-10, 10, (3000, 3)).astype(np.float32)
        m = sphere_crop(pos, rng, radius=3.0)
        assert 0 < m.sum() < len(pos)
        # every kept point is within radius of SOME point (the center)
        kept = pos[m]
        assert kept.shape[1] == 3
        c = cube_crop(pos, rng, c=2.0)
        assert 0 < c.sum() < len(pos)

    def test_density_filter(self, rng):
        from panopticsegforlargescalepointcloud_tpu.data.transforms import (
            density_filter,
        )

        dense = rng.uniform(0, 0.5, (500, 3)).astype(np.float32)
        sparse = np.array([[50.0, 50, 50], [60, 60, 60]], np.float32)
        pos = np.concatenate([dense, sparse])
        m = density_filter(pos, radius=0.3, min_density=5)
        assert m[:500].all()
        assert not m[500:].any()
