"""Training-step wall on TPU: forward+backward+optimizer at bench shapes.

The main bench times the inference forward; training adds the backward pass
(whose gather transposes lower to scatter-adds) and the optimizer update.
Reports the prepare-phase step (no clustering) and the full step
(clustering + ScoreNet + score loss), voxels/sec/chip each.

Timing protocol: see bench.py (chained dependency, 1 vs N+1 difference).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

ITERS = 6


def main():
    from bench import build_inputs, shipped_config
    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
        PointGroup3HeadsNet,
    )
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        init_state,
        make_train_step,
        prepare_example,
    )

    num_tiles = 4
    # the SHIPPED NPM3D flagship config; PST_RG_CAP / PST_SCORER_MULT remain
    # as A/B knobs over the yaml clustering/scorer budgets
    over = {}
    if os.environ.get("PST_RG_CAP"):
        over["rg_point_cap"] = float(os.environ["PST_RG_CAP"])
    if os.environ.get("PST_SCORER_MULT"):
        over["scorer_capacity_mult"] = float(os.environ["PST_SCORER_MULT"])
    cfg, ycfg = shipped_config(
        "npm3d-sparseconv_grid_012_R_16_cylinder_area1",
        num_samples=num_tiles, **over,
    )
    capacity = int(ycfg["data"].get("voxel_capacity", 131072))
    print(f"rg_point_cap={cfg.rg_point_cap} "
          f"(resolved {cfg.resolved_point_cap(capacity)} @ {capacity}) "
          f"scorer_capacity_mult={cfg.scorer_capacity_mult}")
    model = PointGroup3HeadsNet(cfg)
    vb = build_inputs(num_tiles=num_tiles, capacity=capacity)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    valid = int(np.asarray(vb.mask).sum())
    db, hier = prepare_example(arrays, cfg.num_down)
    tx = optax.adam(1e-3)
    state0 = init_state(cfg, model, tx, db, hier, jax.random.PRNGKey(0))
    print(f"valid_voxels={valid}")

    for label, with_clustering in [("prepare", False), ("full", True)]:
        step = make_train_step(cfg, model, tx, with_clustering=with_clustering)
        # donation invalidates state; re-init per phase and chain states
        state = jax.tree_util.tree_map(jnp.copy, state0)

        def run(n, state):
            m = None
            for _ in range(n):
                state, m = step(state, arrays)
            return state, float(m["semantic_loss"])

        state, _ = run(1, state)  # compile
        t0 = time.perf_counter()
        state, _ = run(1, state)
        t1 = time.perf_counter()
        state, _ = run(ITERS + 1, state)
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9) / ITERS
        print(f"{label:8s} step: {dt*1e3:8.1f} ms  {valid/dt:10.0f} voxels/s/chip")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
