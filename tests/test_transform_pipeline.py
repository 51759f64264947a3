"""Config-driven transform pipeline (VERDICT r2 task 5).

Covers: default pipeline == the paper's legacy hardcoded stack bit-for-bit,
yaml-list-driven behavior changes (removing RandomSymmetry), subset
transforms masking every per-point attr, unknown-name errors, and the data
yamls' lists reaching PanopticFileDataset through the trainer path.
Reference: core/data_transform/__init__.py:48-101 instantiate_transforms.
"""

import numpy as np
import pytest
import yaml

from panopticsegforlargescalepointcloud_tpu.data.labels import set_extra_labels
from panopticsegforlargescalepointcloud_tpu.data.transform_pipeline import (
    DEFAULT_TEST_TRANSFORMS,
    DEFAULT_TRAIN_TRANSFORMS,
    TileState,
    build_pipeline,
)
from panopticsegforlargescalepointcloud_tpu.data.transforms import (
    augment_tile,
    finalize_tile,
)

THING = (2,)


def _tile(rng, n=600):
    pos = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    y = rng.integers(1, 3, n).astype(np.int32)
    inst = np.where(y == 2, rng.integers(0, 4, n), -1).astype(np.int32)
    return pos, y, inst


def _run_pipeline(entries, pos, y, inst, seed, train=True, grid=0.25):
    rng = np.random.default_rng(seed)
    pipe = build_pipeline(entries, grid)
    st = TileState(
        pos=pos.copy(),
        attrs={"y": y.copy(), "instance_labels": inst.copy(),
               "origin_id": np.arange(len(pos), dtype=np.int32)},
        train=train,
    )
    pipe.run_geometric(st, rng)
    extra = set_extra_labels(st.pos, st.attrs["y"],
                             st.attrs["instance_labels"], THING, 16)
    st.attrs["instance_labels"] = extra["instance_labels"]
    st.attrs["vote_label"] = extra["vote_label"]
    pipe.run_finalize(st, rng)
    return st


def _run_legacy(pos, y, inst, seed, train=True, grid=0.25):
    rng = np.random.default_rng(seed)
    p = augment_tile(pos.copy(), rng) if train else pos.copy()
    extra = set_extra_labels(p, y, inst, THING, 16)
    attrs = {
        "y": y.astype(np.int32),
        "instance_labels": extra["instance_labels"],
        "vote_label": extra["vote_label"],
        "origin_id": np.arange(len(pos), dtype=np.int32),
    }
    return finalize_tile(p, attrs, grid, rng, train=train)


class TestDefaultParity:
    @pytest.mark.parametrize("train", [True, False])
    def test_matches_legacy_stack(self, train):
        pos, y, inst = _tile(np.random.default_rng(0))
        entries = (DEFAULT_TRAIN_TRANSFORMS if train
                   else DEFAULT_TEST_TRANSFORMS)
        st = _run_pipeline(entries, pos, y, inst, seed=7, train=train)
        legacy = _run_legacy(pos, y, inst, seed=7, train=train)
        np.testing.assert_array_equal(st.coords, legacy["coords"])
        np.testing.assert_allclose(st.pos, legacy["pos"], rtol=1e-6)
        np.testing.assert_allclose(st.feats, legacy["feats"], rtol=1e-6)
        for k in ("y", "instance_labels", "origin_id"):
            np.testing.assert_array_equal(st.attrs[k], legacy[k])
        np.testing.assert_allclose(st.attrs["vote_label"],
                                   legacy["vote_label"], rtol=1e-6)


class TestConfigDriven:
    def test_removing_symmetry_changes_augmentation(self):
        pos, y, inst = _tile(np.random.default_rng(1))
        no_sym = [e for e in DEFAULT_TRAIN_TRANSFORMS
                  if e["transform"] != "RandomSymmetry"]
        a = _run_pipeline(DEFAULT_TRAIN_TRANSFORMS, pos, y, inst, seed=3)
        b = _run_pipeline(no_sym, pos, y, inst, seed=3)
        assert a.pos.shape != b.pos.shape or not np.allclose(a.pos, b.pos)

    def test_unknown_transform_raises(self):
        with pytest.raises(ValueError, match="unknown transform"):
            build_pipeline([{"transform": "NoSuchTransform"}], 0.2)

    def test_no_quantize_is_an_error_in_dataset_path(self):
        # pipeline without GridSampling3D(quantize) -> _make_tile raises;
        # covered at the state level: coords stays None
        entries = [e for e in DEFAULT_TEST_TRANSFORMS
                   if e["transform"] != "GridSampling3D"]
        pos, y, inst = _tile(np.random.default_rng(4), n=100)
        st = _run_pipeline(entries, pos, y, inst, seed=0, train=False)
        assert st.coords is None

    def test_subset_transform_masks_all_attrs(self):
        pos, y, inst = _tile(np.random.default_rng(2), n=400)
        entries = [{"transform": "SphereCrop", "params": {"radius": 2.0}},
                   *DEFAULT_TEST_TRANSFORMS]
        st = _run_pipeline(entries, pos, y, inst, seed=5, train=False)
        n = len(st.pos)
        assert 0 < n  # crop kept something
        for k, v in st.attrs.items():
            assert len(v) == n, k
        assert len(st.feats) == n and len(st.coords) == n

    def test_unresolved_interp_size_falls_back(self):
        entries = [{"transform": "GridSampling3D",
                    "params": {"size": "${data.first_subsampling}",
                               "quantize_coords": True}}]
        pos, y, inst = _tile(np.random.default_rng(6), n=200)
        st = _run_pipeline(entries, pos, y, inst, seed=1, train=False)
        assert st.coords is not None


class TestYamlWiring:
    def test_data_yaml_lists_parse_and_build(self):
        data = yaml.safe_load(open("conf/data/panoptic/treeins_rad8.yaml"))
        for key in ("pre_collate_transform", "train_transforms",
                    "test_transform"):
            assert key in data, key
        pipe = build_pipeline(data["train_transforms"], 0.2)
        names = [e["transform"] for e in pipe.spec]
        assert names[:4] == ["RandomNoise", "RandomRotate",
                             "RandomScaleAnisotropic", "RandomSymmetry"]
        assert "ShiftVoxels" in names
        assert len(pipe.geometric) == 4 and len(pipe.finalize) == 6

    def test_dataset_consumes_transform_lists(self, tmp_path):
        from panopticsegforlargescalepointcloud_tpu.data import (
            TREEINS_SPEC,
            PanopticFileDataset,
            write_ply,
        )

        rng = np.random.default_rng(9)
        pos = rng.uniform(0, 10, (3000, 3)).astype(np.float32)
        sem = rng.integers(1, 3, 3000).astype(np.int32)
        tid = np.where(sem == 2, rng.integers(0, 5, 3000), -1).astype(np.int32)
        ply = str(tmp_path / "t.ply")
        write_ply(ply, [pos, sem, tid], ["x", "y", "z", "semantic_seg",
                                         "treeID"])

        no_sym = [e for e in DEFAULT_TRAIN_TRANSFORMS
                  if e["transform"] != "RandomSymmetry"]
        kw = dict(grid_size=0.25, radius=4.0)
        ds_a = PanopticFileDataset(TREEINS_SPEC, [ply], **kw,
                                   rng=np.random.default_rng(0))
        ds_b = PanopticFileDataset(TREEINS_SPEC, [ply], **kw,
                                   train_transforms=no_sym,
                                   rng=np.random.default_rng(0))
        ta = ds_a.sample_train_tile(np.random.default_rng(42))
        tb = ds_b.sample_train_tile(np.random.default_rng(42))
        assert (ta["pos"].shape != tb["pos"].shape
                or not np.allclose(ta["pos"], tb["pos"]))
