#!/usr/bin/env python
"""Training CLI - same contract as the reference train.py:

    python train.py data=panoptic/treeins_rad8 \
        models=panoptic/area4_ablation_3heads_5 model_name=PointGroup-PAPER \
        training=treeins training.epochs=150 \
        data.files.train='[path/to/a.ply]' data.files.val='[path/to/b.ply]'

Without data files it trains on synthetic planted-instance tiles (smoke mode).
"""

import logging
import os
import sys


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    # The dev image pins JAX_PLATFORMS=axon via sitecustomize (jax already
    # imported); PST_PLATFORM=cpu re-targets after import. PST_CPU_DEVICES=N
    # exposes N virtual CPU devices (test training.num_devices without a
    # multi-chip slice).
    if os.environ.get("PST_CPU_DEVICES"):
        import jax

        jax.config.update("jax_num_cpu_devices", int(os.environ["PST_CPU_DEVICES"]))
    if os.environ.get("PST_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["PST_PLATFORM"])
    overrides = [a for a in sys.argv[1:] if "=" in a]
    conf_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")

    from panopticsegforlargescalepointcloud_tpu.config import load_config
    from panopticsegforlargescalepointcloud_tpu.train.trainer import Trainer

    cfg = load_config(conf_dir, overrides)
    if cfg.get("pretty_print"):
        import yaml

        print(yaml.dump({k: v for k, v in cfg.items() if k != "models"}))

    capacity = int(cfg.get("data", {}).get("voxel_capacity", 65536))
    backbone = str(cfg.get("backbone", "paper"))
    # Run-dir management (reference conf/hydra/output/custom.yaml:
    # ./outputs/${job_name}/${job_name}-${model_name}-${now}): when no
    # checkpoint_dir is given, each run gets its own timestamped directory
    # holding the checkpoint, composed config, and metric logs.
    run_dir = cfg.get("checkpoint_dir") or cfg.get("training", {}).get(
        "checkpoint_dir"
    )
    if not run_dir:
        import time

        job = str(cfg.get("job_name", "benchmark"))
        stamp = time.strftime("%Y%m%d_%H%M%S")
        run_dir = os.path.join(
            "outputs", job, f"{job}-{cfg.get('model_name', 'model')}-{stamp}"
        )
        os.makedirs(run_dir, exist_ok=True)
        logging.info("run dir: %s", run_dir)
    import yaml as _yaml

    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config_composed.yaml"), "w") as f:
        _yaml.safe_dump(cfg, f, default_flow_style=None)
    trainer = Trainer(
        cfg,
        capacity=capacity,
        backbone=backbone,
        checkpoint_dir=run_dir,
    )
    trainer.train()


if __name__ == "__main__":
    main()
