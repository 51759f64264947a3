"""Stage-wise TPU profiling of the forward path using the chained-dependency
timing method (see bench.py): canonicalize only, + hierarchy build, + convs.

Usage: python scripts/profile_tpu.py [stage...]  (default: all)
"""

import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import build_inputs
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

    capacity = int(os.environ.get("BENCH_CAPACITY", "131072"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    stages = sys.argv[1:] or ["canon", "hier", "forward"]

    cfg = PanopticConfig(
        num_classes=9, stuff_classes=(0, 7, 8), backbone="paper", feat_dim=4,
        in_feat=16, num_samples=4, max_instances=64, cluster_radius=0.18,
    )
    model = PointGroup3HeadsNet(cfg)
    vb = build_inputs(num_tiles=4, capacity=capacity)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db0, hier0 = prepare_example(arrays, cfg.num_down)
    state = init_state(cfg, model, optax.adam(1e-3), db0, hier0, jax.random.PRNGKey(0))

    def chain_time(step_fn, feats0):
        """step_fn(feats) -> (new_feats, scalar). Returns sec/iter."""
        f = feats0
        f, s = step_fn(f)
        _ = float(s)  # compile+warm

        def run(n):
            ff = feats0
            ss = None
            for _ in range(n):
                ff, ss = step_fn(ff)
            return float(ss)

        t0 = time.perf_counter()
        run(1)
        t1 = time.perf_counter()
        run(iters + 1)
        t2 = time.perf_counter()
        return max((t2 - t1) - (t1 - t0), 1e-9) / iters

    results = {}

    if "canon" in stages:
        @jax.jit
        def canon_step(feats):
            a = arrays[:3] + (feats,) + arrays[4:]
            db = canonicalize(*a)
            return feats + 1e-30 * jnp.sum(db.pos), jnp.sum(db.feats)

        results["canonicalize_ms"] = chain_time(canon_step, arrays[3]) * 1e3
        print("canonicalize:", results["canonicalize_ms"], "ms")

    if "hier" in stages:
        @jax.jit
        def hier_step(feats):
            a = arrays[:3] + (feats,) + arrays[4:]
            db = canonicalize(*a)
            hier = build_hierarchy(
                db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
                brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
            )
            s = sum(jnp.sum(b.nbr) for b in hier.bricks) + sum(
                jnp.sum(m) for m in hier.down_maps
            ) + sum(jnp.sum(m) for m in hier.up_maps)
            return feats + 1e-30 * s.astype(jnp.float32), s.astype(jnp.float32)

        results["canon_plus_hier_ms"] = chain_time(hier_step, arrays[3]) * 1e3
        print("canon+hierarchy:", results["canon_plus_hier_ms"], "ms")

    if "forward" in stages:
        @jax.jit
        def fwd_step(feats):
            a = arrays[:3] + (feats,) + arrays[4:]
            db = canonicalize(*a)
            hier = build_hierarchy(
                db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
                brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
            )
            x, sem, off, emb = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                db.feats, hier, False, 0.1,
                method=PointGroup3HeadsNet.backbone_heads,
            )
            return feats + 1e-30 * jnp.sum(sem), jnp.sum(sem)

        results["full_forward_ms"] = chain_time(fwd_step, arrays[3]) * 1e3
        print("full forward:", results["full_forward_ms"], "ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
