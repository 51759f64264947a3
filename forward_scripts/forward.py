#!/usr/bin/env python
"""Inference on (possibly unlabeled) point clouds from a checkpoint - the
equivalent of the reference's ``forward_scripts/forward.py:40-104``.

    python forward_scripts/forward.py checkpoint_dir=outputs/run1 \
        data.files.test='[scan.ply]' out_dir=fwd_out

Writes per-file colored semantic + instance PLYs and the raw prediction PLYs.
No metrics are computed (use eval.py for labeled data).
"""

import logging
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    # The dev image pins JAX_PLATFORMS=axon via sitecustomize (jax already
    # imported); PST_PLATFORM=cpu re-targets after import.
    if os.environ.get("PST_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["PST_PLATFORM"])
    overrides = [a for a in sys.argv[1:] if "=" in a]
    conf_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "conf")

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from panopticsegforlargescalepointcloud_tpu.config import (
        load_config,
        panoptic_config_from_yaml,
    )
    from panopticsegforlargescalepointcloud_tpu.data import PanopticFileDataset
    from panopticsegforlargescalepointcloud_tpu.data.ply import write_ply
    from panopticsegforlargescalepointcloud_tpu.eval.merge import SceneAccumulator
    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
        PointGroup3HeadsNet,
    )
    from panopticsegforlargescalepointcloud_tpu.train.checkpoint import ModelCheckpoint
    from panopticsegforlargescalepointcloud_tpu.train.evaluator import (
        FullSceneEvaluator,
        eval_tile_capacity,
    )

    from panopticsegforlargescalepointcloud_tpu.config import explicit_overrides

    cfg = load_config(conf_dir, overrides, root="eval.yaml")
    ckpt_dir = cfg.get("checkpoint_dir")
    if not ckpt_dir:
        raise SystemExit("checkpoint_dir=... is required")
    ckpt = ModelCheckpoint(ckpt_dir)
    run_cfg = dict(ckpt.run_config) or cfg
    run_cfg.setdefault("data", {})
    # only explicit CLI overrides touch the checkpoint's data config
    run_cfg["data"].update(explicit_overrides(overrides).get("data", {}))

    pcfg, spec, _ = panoptic_config_from_yaml(
        run_cfg, backbone=str(run_cfg.get("backbone", "paper")),
        **run_cfg.get("budget_overrides", {}),
    )
    pcfg = dataclasses.replace(pcfg, num_samples=1)
    files = run_cfg["data"].get("files", {}).get("test")
    if not files:
        raise SystemExit("data.files.test='[...ply]' is required")
    dataset = PanopticFileDataset(
        spec,
        files,
        grid_size=float(run_cfg["data"].get("grid_size", 0.2)),
        radius=float(run_cfg["data"].get("radius", 8)),
        sampling_format=str(run_cfg["data"].get("sampling_format", "cylinder")),
        test_transforms=(run_cfg["data"].get("test_transform")
                         or run_cfg["data"].get("test_transforms")),
        pre_collate_transform=run_cfg["data"].get("pre_collate_transform"),
        keep_raw=True,
    )
    model = PointGroup3HeadsNet(pcfg)
    weights = ckpt.get_weights(str(cfg.get("weight_name", "latest")))
    params = jax.tree_util.tree_map(jnp.asarray, weights["params"])
    stats = jax.tree_util.tree_map(jnp.asarray, weights["batch_stats"])

    out_dir = str(cfg.get("out_dir", "forward_outputs"))
    os.makedirs(out_dir, exist_ok=True)
    evaluator = FullSceneEvaluator(
        pcfg, model, params, stats, dataset,
        capacity=eval_tile_capacity(run_cfg["data"]),
    )
    for fi in range(len(dataset.files)):
        raw = dataset.raw_clouds[fi]
        acc = SceneAccumulator(raw["pos"], pcfg.num_classes)
        for ti, (tile, tile_full_ids) in enumerate(dataset.test_tiles(fi)):
            evaluator._process_tile(acc, tile, tile_full_ids, 0.1,
                                    subset_seed=ti)
        sem, ins = acc.finalise(stuff_classes=pcfg.stuff_classes)
        base = osp.splitext(osp.basename(dataset.files[fi]))[0]
        write_ply(
            osp.join(out_dir, f"{base}_pred.ply"),
            [raw["pos"], sem.astype(np.int16), ins.astype(np.int32)],
            ["x", "y", "z", "pred_sem", "pred_ins"],
        )
        logging.info("%s: %d semantic classes, %d instances", base,
                     len(np.unique(sem)), len(np.unique(ins[ins >= 0])))


if __name__ == "__main__":
    main()
