"""Benchmark harness: sparse-UNet panoptic forward throughput on one chip.

Measures the paper-config backbone+heads forward (the hot path of both
training and inference, cf. the reference's own timing split at
``torch_points3d/models/panoptic/minkowski.py:32-35``) in voxels/sec/chip on
synthetic NPM3D-scale cylinder tiles, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the first recorded run on this machine
(bench_baseline.json, created on first use) so improvements are visible
round-over-round; the reference publishes no comparable number (BASELINE.md).
"""

import json
from functools import partial
import os
import time

import numpy as np


def build_inputs(num_tiles=4, capacity=131072, seed=0):
    from panopticsegforlargescalepointcloud_tpu.data import collate_tiles, synthetic_tile

    rng = np.random.default_rng(seed)
    per_tile_budget = capacity // num_tiles
    tiles = []
    for _ in range(num_tiles):
        # NPM3D-ish: 16 m radius cylinder at 0.12 m voxels
        t = synthetic_tile(
            rng,
            num_classes=9,
            stuff_classes=(0, 7, 8),
            n_instances=24,
            pts_per_instance=400,
            n_ground=per_tile_budget,
            radius=16.0,
            grid_size=0.12,
        )
        tiles.append(t)
    vb = collate_tiles(tiles, capacity=capacity, num_tiles=num_tiles)
    return vb


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
        PanopticConfig,
        PointGroup3HeadsNet,
    )
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        canonicalize,
        init_state,
        prepare_example,
    )

    dev = jax.devices()[0]
    num_tiles = int(os.environ.get("BENCH_TILES", "4"))
    capacity = int(os.environ.get("BENCH_CAPACITY", "131072"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    cfg = PanopticConfig(
        num_classes=9,
        stuff_classes=(0, 7, 8),
        backbone="paper",
        feat_dim=4,
        in_feat=16,
        num_samples=num_tiles,
        max_instances=64,
        cluster_radius=0.18,
    )
    model = PointGroup3HeadsNet(cfg)
    vb = build_inputs(num_tiles=num_tiles, capacity=capacity)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    valid_voxels = int(np.asarray(vb.mask).sum())

    db, hier = prepare_example(arrays, cfg.num_down)
    state = init_state(cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0))

    def forward(params, batch_stats, feats, arrays):
        db = canonicalize(*arrays)
        db = db._replace(feats=feats)
        hier = build_hierarchy(
            db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
            brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
        )
        variables = {"params": params, "batch_stats": batch_stats}
        x, sem, off, emb = model.apply(
            variables,
            db.feats,
            hier,
            False,
            0.1,
            method=PointGroup3HeadsNet.backbone_heads,
        )
        return sem, off, emb

    # Honest timing on async/remote backends: chain iterations through a data
    # dependency (outputs perturb the next input) and fetch a scalar at the
    # end, so the runtime must execute every forward; difference a 1-iter run
    # from an (iters+1)-iter run to cancel per-call dispatch/transfer overhead.
    @jax.jit
    def forward_step(params, batch_stats, feats, arrays):
        sem, off, emb = forward(params, batch_stats, feats, arrays)
        carry = feats + 1e-30 * jnp.sum(sem)
        return carry, jnp.sum(sem)

    def run_chain(n):
        feats = arrays[3]
        s = None
        for _ in range(n):
            feats, s = forward_step(state.params, state.batch_stats, feats, arrays)
        return float(s)

    run_chain(1)  # compile + warm
    t0 = time.perf_counter()
    run_chain(1)
    t1 = time.perf_counter()
    run_chain(iters + 1)
    t2 = time.perf_counter()
    dt = max((t2 - t1) - (t1 - t0), 1e-9) / iters

    pps = valid_voxels / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path)).get("points_per_sec", pps)
    else:
        with open(baseline_path, "w") as f:
            json.dump(
                {
                    "points_per_sec": pps,
                    "device": str(dev),
                    "valid_voxels": valid_voxels,
                    "ms_per_forward": dt * 1e3,
                },
                f,
            )
        base = pps

    print(
        json.dumps(
            {
                "metric": "sparse_unet_forward_throughput",
                "value": round(pps, 1),
                "unit": "voxels/sec/chip",
                "vs_baseline": round(pps / base, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
