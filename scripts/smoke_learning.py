"""Learning-evidence run: train the tiny model on a synthetic forest and show
the full-scene panoptic metrics beat the untrained model.

Writes smoke_learning_report.json with {untrained: {...}, trained: {...}}.
Run on CPU: PST_PLATFORM handled internally.
"""

import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def make_forest_ply(path, rng, n_trees=6, extent=16.0):
    from panopticsegforlargescalepointcloud_tpu.data import write_ply

    pts, sem, tid = [], [], []
    for t in range(n_trees):
        c = rng.uniform(2, extent - 2, 2)
        k = 300
        xy = c + rng.normal(scale=0.6, size=(k, 2))
        z = rng.uniform(0, 8, (k, 1))
        pts.append(np.concatenate([xy, z], 1))
        sem.append(np.full(k, 2))
        tid.append(np.full(k, t))
    k = 3000
    ground = np.stack(
        [rng.uniform(0, extent, k), rng.uniform(0, extent, k),
         rng.normal(scale=0.05, size=k)], 1
    )
    pts.append(ground)
    sem.append(np.full(k, 1))
    tid.append(np.full(k, -1))
    pos = np.concatenate(pts).astype(np.float32)
    write_ply(path, [pos, np.concatenate(sem).astype(np.int32),
                     np.concatenate(tid).astype(np.int32)],
              ["x", "y", "z", "semantic_seg", "treeID"])


def main():
    import dataclasses

    import optax

    from panopticsegforlargescalepointcloud_tpu.data import (
        TREEINS_SPEC,
        PanopticFileDataset,
        collate_tiles,
    )
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
        make_train_step,
        prepare_example,
    )

    rng = np.random.default_rng(11)
    import tempfile

    tmp = tempfile.mkdtemp()
    files = []
    for i in range(3):
        p = osp.join(tmp, f"forest{i}.ply")
        make_forest_ply(p, rng)
        files.append(p)

    ds = PanopticFileDataset(
        TREEINS_SPEC, files, grid_size=0.2, radius=6.0, keep_raw=True, rng=rng
    )
    cfg = PanopticConfig(
        num_classes=2, stuff_classes=(0,), backbone="tiny", feat_dim=4,
        in_feat=8, num_samples=2, max_instances=16, max_props_rg=32,
        ms_max_seeds=64, ms_max_clusters=16, ms_point_cap=4096,
        cluster_radius=0.3, min_cluster_points=20, prepare_epoch=8,
    )
    model = PointGroup3HeadsNet(cfg)
    tx = optax.adam(1e-3)

    def batch():
        tiles = [ds.sample_train_tile(rng) for _ in range(cfg.num_samples)]
        return batch_arrays(collate_tiles(tiles, capacity=8192, num_tiles=cfg.num_samples))

    arrays = batch()
    db, hier = prepare_example(arrays, cfg.num_down)
    state = init_state(cfg, model, tx, db, hier, jax.random.PRNGKey(0))

    ecfg = dataclasses.replace(cfg, num_samples=1)

    def full_eval(params, stats, tag):
        ev = FullSceneEvaluator(ecfg, PointGroup3HeadsNet(ecfg), params, stats,
                                ds, capacity=8192)
        reports = ev.run(out_dir=osp.join(tmp, f"eval_{tag}"), ply_output=False)
        keys = ["mIoU", "F1", "meanPQ", "mPrec", "mRec", "mMUCov"]
        return {k: float(np.mean([r[k] for r in reports])) for k in keys}

    untrained = full_eval(state.params, state.batch_stats, "untrained")
    print("untrained:", untrained, flush=True)

    prep = make_train_step(cfg, model, tx, with_clustering=False)
    full = make_train_step(cfg, model, tx, with_clustering=True)
    import os
    epochs = int(os.environ.get("SMOKE_EPOCHS", "48"))
    steps_per = int(os.environ.get("SMOKE_STEPS", "10"))
    for epoch in range(1, epochs + 1):
        step = full if epoch > cfg.prepare_epoch else prep
        losses = []
        for _ in range(steps_per):
            state, m = step(state, batch())
            losses.append(float(m["loss"]))
        print(f"epoch {epoch}: loss={np.mean(losses):.4f}", flush=True)

    trained = full_eval(state.params, state.batch_stats, "trained")
    print("trained:", trained, flush=True)

    report = {"untrained": untrained, "trained": trained,
              "epochs": epochs, "steps_per_epoch": steps_per}
    with open(osp.join(osp.dirname(osp.abspath(__file__)), "..",
                       "smoke_learning_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    assert trained["mIoU"] > untrained["mIoU"]
    # Detection evidence, not just semantics: the clustering->ScoreNet->NMS
    # path must find instances at IoU 0.5 (reference tracks F1/prec/rec per
    # epoch, panoptic_tracker_pointgroup_treeins.py:742-911). Thresholds are
    # env-overridable for quick runs, but the default run must detect.
    min_f1 = float(os.environ.get("SMOKE_MIN_F1", "0.3"))
    assert trained["F1"] >= min_f1, (
        f"trained F1 {trained['F1']:.3f} < {min_f1}: instance-detection "
        "path is not learning")
    assert trained["mPrec"] > 0 and trained["mRec"] > 0, report
    print("OK: learning confirmed (semantics + instance detection)")


if __name__ == "__main__":
    main()
