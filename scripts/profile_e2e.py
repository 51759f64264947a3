"""Stage-level wall breakdown of the end-to-end scene bench (bench.measure_e2e
shapes): dataset load/voxelize, test-tile construction, the tile loop
(device forward + overlapped host merge), finalise (full-res projection +
instance filters), and the PQ report. Identifies what stands between the
24.5 s single-chip scene (bench_e2e.json r3) and the <=20 s target when the
device phases are already ~9 s.

Run on the real TPU: `python scripts/profile_e2e.py`.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp
    import optax

    from bench import measure_e2e  # noqa: F401 (same scene recipe below)
    from panopticsegforlargescalepointcloud_tpu.data import (
        PanopticFileDataset,
        TREEINS_SPEC,
        collate_tiles,
    )
    from panopticsegforlargescalepointcloud_tpu.data.ply import write_ply
    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
        PanopticConfig,
        PointGroup3HeadsNet,
    )
    from panopticsegforlargescalepointcloud_tpu.train.evaluator import (
        FullSceneEvaluator,
    )
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        init_state,
        prepare_example,
    )
    from panopticsegforlargescalepointcloud_tpu.eval.merge import SceneAccumulator

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="prof_e2e_")
    try:
        pts, sem, tid = [], [], []
        extent, n_trees = 35.0, 100
        for t in range(n_trees):
            c = rng.uniform(2, extent - 2, 2)
            k = 2000
            xy = c + rng.normal(scale=0.8, size=(k, 2))
            z = rng.uniform(0, 18, (k, 1)) * rng.uniform(0.5, 1.0)
            pts.append(np.concatenate([xy, z], 1))
            sem.append(np.full(k, 2))
            tid.append(np.full(k, t))
        k = 300_000
        ground = np.stack(
            [rng.uniform(0, extent, k), rng.uniform(0, extent, k),
             rng.normal(scale=0.05, size=k)], 1,
        )
        pts.append(ground)
        sem.append(np.full(k, 1))
        tid.append(np.full(k, -1))
        pos = np.concatenate(pts).astype(np.float32)
        ply = os.path.join(tmp, "scene.ply")
        write_ply(
            ply,
            [pos, np.concatenate(sem).astype(np.int32),
             np.concatenate(tid).astype(np.int32)],
            ["x", "y", "z", "semantic_seg", "treeID"],
        )

        t0 = time.perf_counter()
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=8.0, keep_raw=True,
        )
        t_load = time.perf_counter() - t0

        cfg = PanopticConfig(
            num_classes=2, stuff_classes=(0,), backbone="paper", feat_dim=4,
            in_feat=16, num_samples=1, max_instances=64,
            rg_point_cap=20480, scorer_capacity_mult=0.5,
        )
        model = PointGroup3HeadsNet(cfg)
        t0 = time.perf_counter()
        tiles = ds.test_tiles(0)
        t_tiles = time.perf_counter() - t0

        vb = collate_tiles([tiles[0][0]], capacity=32768, num_tiles=1)
        db, hier = prepare_example(batch_arrays(vb), cfg.num_down)
        state = init_state(
            cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0)
        )
        ev = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds, capacity=32768,
        )
        # warm/compile pass (also warms test_tiles' KD caches if any)
        ev.run(out_dir=os.path.join(tmp, "warm"), ply_output=False)

        raw = ds.raw_clouds[0]
        # timed, stage by stage (mirrors FullSceneEvaluator.run)
        t0 = time.perf_counter()
        tiles = ds.test_tiles(0)
        t_tiles2 = time.perf_counter() - t0

        acc = SceneAccumulator(raw["pos"], cfg.num_classes)
        t0 = time.perf_counter()
        t_collate = 0.0
        pending = None
        for tile, tile_full_ids in tiles:
            tc = time.perf_counter()
            vb = collate_tiles([tile], capacity=32768, num_tiles=1)
            arrays = batch_arrays(vb)
            t_collate += time.perf_counter() - tc
            dbt, out = ev._fwd(ev.params, ev.batch_stats, arrays)
            if pending is not None:
                ev._accumulate_device(acc, *pending, 0.1, None)
            pending = (dbt, out, tile_full_ids)
        if pending is not None:
            ev._accumulate_device(acc, *pending, 0.1, None)
        t_loop = time.perf_counter() - t0

        t0 = time.perf_counter()
        sem_l, ins_l = acc.finalise(
            stuff_classes=cfg.stuff_classes, distance_cutoff=1.0,
            min_instance_size=10,
        )
        t_fin = time.perf_counter() - t0

        from panopticsegforlargescalepointcloud_tpu.eval.panoptic_quality import (
            final_eval,
        )

        t0 = time.perf_counter()
        final_eval(
            sem_l, ins_l, raw["y"], raw["instance_labels"],
            num_classes_raw=cfg.num_classes,
            thing_classes_raw=ds.spec.thing_classes,
            stuff_classes_raw=ds.spec.stuff_classes,
            output_file=os.path.join(tmp, "Evaluation_0"),
        )
        t_pq = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc.vote_miou(raw["y"], cfg.num_classes)
        t_miou = time.perf_counter() - t0

        total = t_tiles2 + t_loop + t_fin + t_pq + t_miou
        print(f"dataset load+voxelize: {t_load:7.2f} s (one-time)")
        print(f"test_tiles (cold):     {t_tiles:7.2f} s")
        print(f"test_tiles (warm):     {t_tiles2:7.2f} s")
        print(f"tile loop total:       {t_loop:7.2f} s  ({len(tiles)} tiles, "
              f"{t_loop/len(tiles)*1e3:.0f} ms/tile)")
        print(f"  of which collate:    {t_collate:7.2f} s")
        print(f"finalise:              {t_fin:7.2f} s")
        print(f"final_eval PQ:         {t_pq:7.2f} s")
        print(f"vote_miou:             {t_miou:7.2f} s")
        print(f"scene total (timed):   {total:7.2f} s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
