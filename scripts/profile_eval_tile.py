"""Split the eval-tile clustering+ScoreNet wall (bench_phases showed ~650ms
per 32k-voxel tile) into: region_grow / mean_shift / proposal assembly /
scorer grid+hierarchy / scorer UNet.

Same chained-dependency timing protocol as bench.py.
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = 6


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
    from panopticsegforlargescalepointcloud_tpu.cluster.meanshift import mean_shift
    from panopticsegforlargescalepointcloud_tpu.cluster.region_grow import region_grow
    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
        PanopticConfig,
        PointGroup3HeadsNet,
        build_proposals,
        scorer_inputs,
    )
    from panopticsegforlargescalepointcloud_tpu.cluster.meanshift import (
        pack_by_sample,
    )
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        canonicalize,
        init_state,
        panoptic_forward,
        prepare_example,
    )
    import optax

    import os

    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    cfg = PanopticConfig(
        num_classes=9, stuff_classes=(0, 7, 8), backbone="paper", feat_dim=4,
        in_feat=16, num_samples=1, max_instances=64, cluster_radius=0.18,
        # shipped product budgets by default (conf model yamls); override
        # for A/B (PST_RG_CAP=0 = uncompacted, PST_RG_DENSE=off = edge path)
        rg_point_cap=float(os.environ.get("PST_RG_CAP", "0.375")),
        scorer_capacity_mult=float(os.environ.get("PST_SCORER_MULT", "0.375")),
        rg_dense=os.environ.get("PST_RG_DENSE", "auto"),
    )
    model = PointGroup3HeadsNet(cfg)
    vb = build_inputs(num_tiles=1, capacity=cap)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db, hier = prepare_example(arrays, cfg.num_down)
    state = init_state(cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0))
    print(f"cap={cap} cfg: rg_k={cfg.rg_k_neighbors} cell_cap={cfg.rg_cell_cap} "
          f"ms_seeds={cfg.ms_max_seeds} ms_cap={cfg.ms_point_cap} "
          f"rg_sources={cfg.rg_sources} scorer={cfg.scorer_type}")

    pos = db.pos
    batch = db.grid.batch
    valid = db.grid.mask
    n = pos.shape[0]
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.integers(0, 9, n), jnp.int32)
    thing = valid & (pred != 0) & (pred != 7) & (pred != 8)
    embeds = jnp.asarray(rng.normal(size=(n, cfg.embed_dim)), jnp.float32)
    offsets = jnp.asarray(rng.normal(scale=0.1, size=(n, 3)), jnp.float32)
    sem_logp = jnp.asarray(rng.normal(size=(n, 9)), jnp.float32)
    feats16 = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)

    @jax.jit
    def f_rg(x):
        rg = region_grow(
            pos + x, pred, batch, thing, radius=cfg.cluster_radius,
            max_proposals=cfg.max_props_rg, min_cluster_size=cfg.min_cluster_size,
            k_neighbors=cfg.rg_k_neighbors, cell_cap=cfg.rg_cell_cap,
        )
        s = jnp.sum(rg.point_prop.astype(jnp.float32))
        return x + 1e-30 * s.astype(x.dtype), s

    @jax.jit
    def f_ms(x):
        dense, dvalid, _, _ = pack_by_sample(
            embeds + 1e-30 * x[:, :1], batch, thing, cfg.num_samples, cfg.ms_point_cap
        )
        ms = mean_shift(dense, dvalid, bandwidth=cfg.bandwidth,
                        max_seeds=cfg.ms_max_seeds)
        s = jnp.sum(ms.labels.astype(jnp.float32))
        return x + 1e-30 * s.astype(x.dtype), s

    @jax.jit
    def f_props(x):
        props, _, _ = build_proposals(cfg, pos + x, offsets, embeds, sem_logp, batch, valid)
        s = jnp.sum(props.prop_id.astype(jnp.float32))
        return x + 1e-30 * s.astype(x.dtype), s

    props0 = jax.jit(
        lambda: build_proposals(cfg, pos, offsets, embeds, sem_logp, batch, valid)[0]
    )()

    @jax.jit
    def f_scorer_grid(x):
        grid, shier, sf, inverse, ov = scorer_inputs(
            cfg, props0, db.grid.coords, feats16 + 1e-30 * x[:, :1]
        )
        # consume the hierarchy too (sum of masks) so it isn't DCE'd
        s = jnp.sum(sf) + sum(
            jnp.sum(g.mask.astype(jnp.float32)) for g in shier.grids
        )
        return x + 1e-30 * s.astype(x.dtype), s

    @jax.jit
    def f_score_net(x):
        grid, shier, sf, inverse, ov = scorer_inputs(
            cfg, props0, db.grid.coords, feats16 + 1e-30 * x[:, :1]
        )
        scores, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            sf, shier, grid.batch, cfg.total_props, False, 0.1,
            method=PointGroup3HeadsNet.score,
        )
        s = jnp.sum(scores)
        return x + 1e-30 * s.astype(x.dtype), s

    @jax.jit
    def f_full(x):
        hier2 = build_hierarchy(
            db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
            brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
        )
        out, _ = panoptic_forward(
            cfg, model, {"params": state.params, "batch_stats": state.batch_stats},
            db._replace(feats=x), hier2, train=False, with_clustering=True,
        )
        s = jnp.sum(out.semantic_logits) + jnp.sum(out.cluster_scores)
        return x + 1e-30 * s.astype(x.dtype), s

    x0 = db.feats
    x3 = jnp.zeros((n, 3), jnp.float32)
    print(f"region_grow:   {measure(f_rg, x3):8.2f} ms")
    sys.stdout.flush()
    print(f"mean_shift:    {measure(f_ms, x3):8.2f} ms")
    sys.stdout.flush()
    print(f"build_props:   {measure(f_props, x3):8.2f} ms")
    sys.stdout.flush()
    print(f"scorer_grid:   {measure(f_scorer_grid, x3):8.2f} ms (grid+hier, no unet)")
    sys.stdout.flush()
    print(f"scorer_full:   {measure(f_score_net, x3):8.2f} ms (grid+hier+unet+head)")
    sys.stdout.flush()
    print(f"full panoptic: {measure(f_full, x0):8.2f} ms")


if __name__ == "__main__":
    main()
