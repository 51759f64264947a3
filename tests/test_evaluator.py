"""End-to-end full-scene evaluation on a synthetic forest: tiling, vote
accumulation, block merging, finalise, PQ report and PLY outputs."""

import dataclasses
import os.path as osp

import jax
import numpy as np
import optax
import pytest

from panopticsegforlargescalepointcloud_tpu.config import load_config
from panopticsegforlargescalepointcloud_tpu.data import (
    TREEINS_SPEC,
    PanopticFileDataset,
)
from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
    PanopticConfig,
    PointGroup3HeadsNet,
)
from panopticsegforlargescalepointcloud_tpu.train.checkpoint import ModelCheckpoint
from panopticsegforlargescalepointcloud_tpu.train.evaluator import FullSceneEvaluator
from panopticsegforlargescalepointcloud_tpu.train.step import (
    batch_arrays,
    init_state,
    prepare_example,
)
from test_data import make_forest_ply


class TestFullSceneEval:
    def test_runs_and_reports(self, tmp_path, rng):
        ply = str(tmp_path / "forest.ply")
        make_forest_ply(ply, rng, n_trees=4, extent=14.0)
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=7.0, keep_raw=True, rng=rng
        )
        cfg = PanopticConfig(
            num_classes=2, stuff_classes=(0,), backbone="tiny", feat_dim=4,
            in_feat=8, num_samples=1, max_instances=16, max_props_rg=32,
            ms_max_seeds=32, ms_max_clusters=8, ms_point_cap=2048,
            cluster_radius=0.3, min_cluster_points=10,
        )
        model = PointGroup3HeadsNet(cfg)
        tile = ds.sample_train_tile(rng)
        from panopticsegforlargescalepointcloud_tpu.data import collate_tiles

        vb = collate_tiles([tile], capacity=4096, num_tiles=1)
        arrays = batch_arrays(vb)
        db, hier = prepare_example(arrays, cfg.num_down)
        state = init_state(cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0))

        ev = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096
        )
        reports = ev.run(out_dir=str(tmp_path / "out"))
        assert len(reports) == 1
        r = reports[0]
        for k in ["meanPQ", "F1", "mIoU", "oAcc", "vote_miou"]:
            assert k in r and np.isfinite(r[k]), k
        assert osp.exists(str(tmp_path / "out" / "Semantic_results_forEval_0.ply"))
        assert osp.exists(str(tmp_path / "out" / "Instance_Results_forEval0.ply"))
        assert osp.exists(str(tmp_path / "out" / "Evaluation_0.txt"))

    def test_oracle_predictions_give_perfect_pq(self, tmp_path, rng):
        """Bypass the net: feed GT as logits through the merge/finalise path
        to prove the stitching machinery is lossless (metric-parity seam)."""
        from panopticsegforlargescalepointcloud_tpu.eval.merge import SceneAccumulator
        from panopticsegforlargescalepointcloud_tpu.eval.panoptic_quality import (
            final_eval,
        )

        ply = str(tmp_path / "forest.ply")
        make_forest_ply(ply, rng, n_trees=4, extent=14.0)
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=7.0, keep_raw=True, rng=rng
        )
        raw = ds.raw_clouds[0]
        acc = SceneAccumulator(raw["pos"], 2)
        for tile, tile_full_ids in ds.test_tiles(0):
            n = len(tile["y"])
            logits = np.full((n, 2), -10.0, np.float32)
            logits[np.arange(n), np.maximum(tile["y"], 0)] = 10.0
            # oracle clusters from gt instance ids (tile-local)
            clusters = [
                np.where(tile["instance_labels"] == g)[0]
                for g in np.unique(tile["instance_labels"])
                if g > 0
            ]
            scores = np.linspace(0.9, 0.99, len(clusters)) if clusters else None
            acc.add_tile(
                tile["origin_id"].astype(np.int64), logits, tile_full_ids,
                clusters, scores,
            )
        sem, ins = acc.finalise(stuff_classes=(0,), min_instance_size=10)
        r = final_eval(
            sem, ins, raw["y"], raw["instance_labels"],
            num_classes_raw=2, thing_classes_raw=[1], stuff_classes_raw=[0],
        )
        assert r["mIoU"] > 0.99
        assert r["F1"] > 0.99
        assert r["meanPQ_things"] > 0.97
        assert r["mMUCov"] > 0.97


class TestGroupedDispatchEval:
    def test_matches_sequential(self, tmp_path, rng):
        """tiles_per_dispatch=2 (two tiles as one 2-sample forward) must
        reproduce the per-tile path: clustering is per-sample by
        construction and proposals split by prop_batch before host
        NMS/merge (train/evaluator.py grouped dispatch)."""
        ply = str(tmp_path / "forest.ply")
        make_forest_ply(ply, rng, n_trees=4, extent=14.0)
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=7.0, keep_raw=True, rng=rng
        )
        cfg = PanopticConfig(
            num_classes=2, stuff_classes=(0,), backbone="tiny", feat_dim=4,
            in_feat=8, num_samples=1, max_instances=16, max_props_rg=32,
            ms_max_seeds=32, ms_max_clusters=8, ms_point_cap=2048,
            cluster_radius=0.3, min_cluster_points=10,
        )
        model = PointGroup3HeadsNet(cfg)
        from panopticsegforlargescalepointcloud_tpu.data import collate_tiles

        tile = ds.sample_train_tile(rng)
        vb = collate_tiles([tile], capacity=4096, num_tiles=1)
        db, hier = prepare_example(batch_arrays(vb), cfg.num_down)
        state = init_state(
            cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0)
        )

        seq = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096
        ).run(out_dir=str(tmp_path / "seq_g"))
        grp = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096,
            tiles_per_dispatch=2,
        ).run(out_dir=str(tmp_path / "grp"))
        assert len(seq) == len(grp) == 1
        for k, v in seq[0].items():
            if isinstance(v, float):
                assert grp[0][k] == pytest.approx(v, abs=1e-6), k
        # the stitched label fields themselves must match, not just metrics
        from panopticsegforlargescalepointcloud_tpu.data.ply import read_ply

        for name in ("Semantic_results_forEval_0", "Instance_Results_forEval0"):
            a = read_ply(str(tmp_path / "seq_g" / f"{name}.ply"))
            b = read_ply(str(tmp_path / "grp" / f"{name}.ply"))
            np.testing.assert_array_equal(a["preds"], b["preds"])


    def test_matches_sequential_embed_subsets(self, tmp_path, rng):
        """Embed family with random-subset loop strategies: grouped dispatch
        draws each tile's feature subsets from the tile's own counter, so
        g=2 must match the g=1 sequential path bit-for-bit (VERDICT r3 weak
        #7 - previously a documented divergence)."""
        ply = str(tmp_path / "forest.ply")
        make_forest_ply(ply, rng, n_trees=4, extent=14.0)
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=7.0, keep_raw=True, rng=rng
        )
        cfg = PanopticConfig(
            num_classes=2, stuff_classes=(0,), backbone="tiny", feat_dim=4,
            in_feat=8, num_samples=1, max_instances=16, max_props_rg=32,
            model_family="embed", cluster_type=10,  # mean-shift embed, 6 subset runs
            use_score_net=False, scorer_type="",
            hd_max_clusters=8, hd_point_cap=512, loop_max_clusters=4,
            ms_max_seeds=32, ms_max_clusters=8, ms_point_cap=2048,
            cluster_radius=0.3, min_cluster_points=10,
        )
        model = PointGroup3HeadsNet(cfg)
        from panopticsegforlargescalepointcloud_tpu.data import collate_tiles

        tile = ds.sample_train_tile(rng)
        vb = collate_tiles([tile], capacity=4096, num_tiles=1)
        db, hier = prepare_example(batch_arrays(vb), cfg.num_down)
        state = init_state(
            cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0)
        )

        seq = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096
        ).run(out_dir=str(tmp_path / "seq_e"))
        grp = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096,
            tiles_per_dispatch=2,
        ).run(out_dir=str(tmp_path / "grp_e"))
        assert len(seq) == len(grp) == 1
        for k, v in seq[0].items():
            if isinstance(v, float):
                assert grp[0][k] == pytest.approx(v, abs=1e-6), k
        from panopticsegforlargescalepointcloud_tpu.data.ply import read_ply

        for name in ("Semantic_results_forEval_0", "Instance_Results_forEval0"):
            a = read_ply(str(tmp_path / "seq_e" / f"{name}.ply"))
            b = read_ply(str(tmp_path / "grp_e" / f"{name}.ply"))
            np.testing.assert_array_equal(a["preds"], b["preds"])


class TestMeshParallelEval:
    def test_matches_sequential(self, tmp_path, rng):
        """num_devices>1 eval (one tile per device, sharded forward) must
        reproduce the sequential path bit-for-bit: same merge order, same
        reports (parallel/mesh.py:make_parallel_eval_forward)."""
        from panopticsegforlargescalepointcloud_tpu.data import collate_tiles
        from panopticsegforlargescalepointcloud_tpu.parallel import make_mesh

        ply = str(tmp_path / "forest.ply")
        make_forest_ply(ply, rng, n_trees=4, extent=14.0)
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=7.0, keep_raw=True, rng=rng
        )
        cfg = PanopticConfig(
            num_classes=2, stuff_classes=(0,), backbone="tiny", feat_dim=4,
            in_feat=8, num_samples=1, max_instances=16, max_props_rg=32,
            ms_max_seeds=32, ms_max_clusters=8, ms_point_cap=2048,
            cluster_radius=0.3, min_cluster_points=10,
        )
        model = PointGroup3HeadsNet(cfg)
        tile = ds.sample_train_tile(rng)
        vb = collate_tiles([tile], capacity=4096, num_tiles=1)
        db, hier = prepare_example(batch_arrays(vb), cfg.num_down)
        state = init_state(
            cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0)
        )

        seq = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096
        ).run(out_dir=str(tmp_path / "seq"))
        mesh = make_mesh(jax.devices()[:4])
        par = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096,
            mesh=mesh,
        ).run(out_dir=str(tmp_path / "par"))
        assert len(seq) == len(par) == 1
        for k, v in seq[0].items():
            if isinstance(v, float):
                assert par[0][k] == pytest.approx(v, abs=1e-6), k

    def test_matches_sequential_no_scorer(self, tmp_path, rng):
        """use_score_net=False configs (Setting I family) return scores=None;
        the sharded path must reproduce the sequential extract_clusters
        early-exit (ALL proposals, no NMS/score filter), not substitute
        all-ones scores (ADVICE r2 medium)."""
        from panopticsegforlargescalepointcloud_tpu.data import collate_tiles
        from panopticsegforlargescalepointcloud_tpu.parallel import make_mesh

        ply = str(tmp_path / "forest.ply")
        make_forest_ply(ply, rng, n_trees=4, extent=14.0)
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=7.0, keep_raw=True, rng=rng
        )
        cfg = PanopticConfig(
            num_classes=2, stuff_classes=(0,), backbone="tiny", feat_dim=4,
            in_feat=8, num_samples=1, max_instances=16, max_props_rg=32,
            ms_max_seeds=32, ms_max_clusters=8, ms_point_cap=2048,
            cluster_radius=0.3, min_cluster_points=10,
            use_score_net=False,
        )
        model = PointGroup3HeadsNet(cfg)
        tile = ds.sample_train_tile(rng)
        vb = collate_tiles([tile], capacity=4096, num_tiles=1)
        db, hier = prepare_example(batch_arrays(vb), cfg.num_down)
        state = init_state(
            cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0)
        )

        seq = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096
        ).run(out_dir=str(tmp_path / "seq_ns"))
        mesh = make_mesh(jax.devices()[:4])
        par = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=4096,
            mesh=mesh,
        ).run(out_dir=str(tmp_path / "par_ns"))
        assert len(seq) == len(par) == 1
        for k, v in seq[0].items():
            if isinstance(v, float):
                assert par[0][k] == pytest.approx(v, abs=1e-6), k
