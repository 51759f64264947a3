"""In-situ A/B of the windowed-streaming conv inside the real model: time
backbone_heads at bench shapes with win_maps on vs off, and the same with
only the backbone trunk (no heads), to locate the gap between the per-conv
winconv speedups (3.6-4.9x, scripts/bench_winconv.py) and the modest phase
cut (322 -> 242 ms, bench_phases.json r3).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

ITERS = 8


def measure(step, x0):
    def chain(n):
        x, s = x0, None
        for _ in range(n):
            x, s = step(x)
        return float(s)

    chain(1)
    t0 = time.perf_counter()
    chain(1)
    t1 = time.perf_counter()
    chain(ITERS + 1)
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS * 1e3


def main():
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

    cfg = PanopticConfig(
        num_classes=9, stuff_classes=(0, 7, 8), backbone="paper", feat_dim=4,
        in_feat=16, num_samples=4, max_instances=64, cluster_radius=0.18,
    )
    model = PointGroup3HeadsNet(cfg)
    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db, hier = prepare_example(arrays, cfg.num_down)
    state = init_state(cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0))

    for win in (True, False):
        @jax.jit
        def fwd(feats, arrays):
            db = canonicalize(*arrays)
            db = db._replace(feats=feats)
            h = build_hierarchy(db.grid, cfg.num_down, win_maps=win)
            x, sem, off, emb = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                db.feats, h, False, 0.1,
                method=PointGroup3HeadsNet.backbone_heads,
            )
            s = jnp.sum(sem) + jnp.sum(x)
            return feats + 1e-30 * s.astype(feats.dtype), s

        @jax.jit
        def trunk(feats, arrays):
            db = canonicalize(*arrays)
            db = db._replace(feats=feats)
            h = build_hierarchy(db.grid, cfg.num_down, win_maps=win)
            x = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                db.feats, h, False, 0.1,
                method=PointGroup3HeadsNet.backbone_only,
            )
            s = jnp.sum(x)
            return feats + 1e-30 * s.astype(feats.dtype), s

        t_full = measure(lambda x: fwd(x, arrays), arrays[3])
        print(f"win={win}  hierarchy+backbone+heads: {t_full:7.2f} ms")
        try:
            t_trunk = measure(lambda x: trunk(x, arrays), arrays[3])
            print(f"win={win}  hierarchy+trunk only:      {t_trunk:7.2f} ms")
        except Exception as e:  # backbone_only may not exist
            print(f"(trunk probe unavailable: {type(e).__name__})")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
