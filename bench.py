"""Benchmark harness: sparse-UNet panoptic forward throughput on one chip.

Measures the paper-config backbone+heads forward (the hot path of both
training and inference, cf. the reference's own timing split at
``torch_points3d/models/panoptic/minkowski.py:32-35``) in voxels/sec/chip on
synthetic NPM3D-scale cylinder tiles, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the first recorded run on this machine
(bench_baseline.json, created on first use) so improvements are visible
round-over-round; the reference publishes no comparable number (BASELINE.md).

With BENCH_PHASES=1 it additionally measures the per-phase wall split the
reference tracked (canonicalize / hierarchy+kernel maps / backbone+heads /
clustering+ScoreNet on device, block merging on host) and writes it to
bench_phases.json (stderr summary; stdout stays the single JSON line).
"""

import dataclasses
import json
from functools import partial
import os
import sys
import time

import numpy as np

_CONF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")

_WINCONV_OK: "bool | None" = None


def winconv_canary() -> bool:
    """Compile + run the windowed Pallas kernels once (fwd lane-pack, dX,
    dW lane-unpack) on the default backend before committing the bench to
    them. Mosaic's vector-op support varies across libtpu builds - the
    round-4 driver terminal rejected a shape cast the in-round terminal had
    accepted and the whole bench died rc=1 (BENCH_r04.json). On any kernel
    failure the bench now degrades to the exact row-gather conv
    (use_winconv=off) and still reports a number."""
    global _WINCONV_OK
    if _WINCONV_OK is not None:
        return _WINCONV_OK
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        _WINCONV_OK = True  # interpret mode: nothing backend-specific to probe
        return True
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
        make_windowed,
        pack_feats,
        unpack_feats,
        windowed_conv,
    )

    try:
        n = 2048
        i = jnp.arange(n, dtype=jnp.int32)
        off = jnp.arange(-13, 14, dtype=jnp.int32)
        idx = jnp.clip(i[:, None] + off[None, :], 0, n - 1)  # monotone cols
        wm = jax.jit(lambda x: make_windowed(x, n, tr=256, w=512, u=2048))(idx)
        f = jnp.ones((n, 16), jnp.bfloat16)
        w = jnp.full((27, 16, 16), 0.01, jnp.bfloat16)

        def loss(f, w):
            o = windowed_conv(pack_feats(f), wm, w, wm, out_packed=True)
            ou = unpack_feats(o).astype(jnp.float32)
            return jnp.sum(ou * ou)

        gf, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(f, w)
        assert np.isfinite(float(jnp.sum(gw.astype(jnp.float32))))
        _WINCONV_OK = True
    except Exception as e:  # compile OR runtime failure -> row-gather path
        print(
            "WARNING: windowed Pallas conv unusable on this backend "
            f"({type(e).__name__}: {str(e)[:300]}); bench falls back to the "
            "row-gather conv (use_winconv=off)",
            file=sys.stderr,
        )
        _WINCONV_OK = False
    return _WINCONV_OK


def shipped_config(data: str, num_samples: int, **overrides):
    """Build the PanopticConfig the PRODUCT CLIs would run - the bench
    measures the shipped flagship yaml (Setting IV + its clustering/scorer
    budgets), not a bench-only configuration. Returns (cfg, composed_yaml).

    If the windowed Pallas kernels don't compile on this backend's libtpu
    build (see :func:`winconv_canary`), the config degrades to the exact
    row-gather conv so the bench still completes."""
    if not winconv_canary():
        overrides.setdefault("use_winconv", "off")
    from panopticsegforlargescalepointcloud_tpu.config import (
        load_config,
        panoptic_config_from_yaml,
    )

    ycfg = load_config(
        _CONF_DIR,
        [
            f"data=panoptic/{data}",
            "models=panoptic/area4_ablation_3heads_5",
            "model_name=PointGroup-PAPER",
        ],
    )
    pcfg, _, _ = panoptic_config_from_yaml(ycfg)
    return dataclasses.replace(pcfg, num_samples=num_samples, **overrides), ycfg


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


def conv_schedule(cfg):
    """Enumerate every sparse conv of the backbone as (map_kind, level, cin,
    cout) plus pointwise dense layers as (level, cin, cout), mirroring
    models/unet.py + models/modules.py exactly (ResNetDown keeps cin through
    a strided conv; ResBlocks carry the widening + 1x1 shortcut)."""
    from panopticsegforlargescalepointcloud_tpu.models.plans import (
        paper_backbone_plan,
        tiny_backbone_plan,
    )

    plan = (paper_backbone_plan if cfg.backbone == "paper"
            else tiny_backbone_plan)(cfg.feat_dim, cfg.in_feat)
    convs, dense = [], []
    nb = plan["num_blocks"]
    level = 0

    def resblocks(level, cin, cout):
        for b in range(nb):
            inc = cin if b == 0 else cout
            convs.append(("same", level, inc, cout))
            convs.append(("same", level, cout, cout))
            if inc != cout:
                dense.append((level, inc, cout))

    for (cin, cout), s in zip(plan["down_channels"], plan["down_strides"]):
        if s == 1:
            convs.append(("same", level, cin, cout))
            resblocks(level, cout, cout)
        else:
            convs.append(("down", level, cin, cin))
            level += 1
            resblocks(level, cin, cout)
    for (cin, cout), s in zip(plan["up_channels"], plan["up_strides"]):
        if s == 1:
            convs.append(("same", level, cin, cout))
            resblocks(level, cout, cout)
        else:
            convs.append(("up", level - 1, cin, cin))
            level -= 1
            resblocks(level, cin, cout)
    # heads (models/pointgroup3heads.py): 2-layer MLPs on level-0 rows
    f = cfg.in_feat
    dense += [(0, f, f), (0, f, cfg.num_classes)]  # semantic
    dense += [(0, f, f), (0, f, 3)]  # offset
    dense += [(0, f, f), (0, f, cfg.embed_dim)]  # embed
    return convs, dense


# v5e-1 peaks for the utilization anchor (override for other chips):
# 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
_PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
_PEAK_GBPS = float(os.environ.get("BENCH_PEAK_GBPS", "819"))


def hw_utilization(cfg, hier, dt_s):
    """Hardware-anchored accounting for the measured forward (VERDICT r3
    weak #5: 'is 417k voxels/s good?' needs an absolute denominator).

    FLOPs are exact: 2 * nnz * cin * cout per conv, with nnz = the real
    kernel-map pair count pulled from the built hierarchy. Bytes use two
    models: ``min`` reads each live input row once and writes each output
    row once (perfect reuse - the speed-of-light floor) and ``gather`` pays
    one cin-row read per kernel-map pair (the row-gather path's actual
    traffic; the windowed kernel sits between the two).
    """
    import jax
    import jax.numpy as jnp

    def _idx(m):
        return m.idx if hasattr(m, "idx") else m

    @jax.jit
    def counts():
        same = [jnp.sum(_idx(b) >= 0) for b in hier.bricks]
        down = [jnp.sum(_idx(m) >= 0) for m in hier.down_maps]
        up = [jnp.sum(_idx(m) >= 0) for m in hier.up_maps]
        rows = [jnp.sum(g.mask) for g in hier.grids]
        return (jnp.stack(same), jnp.stack(down), jnp.stack(up),
                jnp.stack(rows))

    same_n, down_n, up_n, rows_n = (np.asarray(c) for c in counts())
    convs, dense = conv_schedule(cfg)
    nnz_of = {"same": same_n, "down": down_n, "up": up_n}
    out_rows = {
        "same": lambda l: rows_n[l],
        "down": lambda l: rows_n[l + 1],
        "up": lambda l: rows_n[l],
    }
    bin_, bout = 2, 4  # bf16 compute dtype in, fp32 accumulate out
    flops = min_bytes = gather_bytes = 0.0
    for kind, l, cin, cout in convs:
        nnz = float(nnz_of[kind][l])
        ro = float(out_rows[kind](l))
        ri = float(rows_n[l + 1] if kind == "up" else rows_n[l])
        flops += 2.0 * nnz * cin * cout
        min_bytes += ri * cin * bin_ + ro * cout * bout
        gather_bytes += nnz * cin * bin_ + ro * cout * bout
    for l, cin, cout in dense:
        r = float(rows_n[l])
        flops += 2.0 * r * cin * cout
        b = r * (cin * bin_ + cout * bout)
        min_bytes += b
        gather_bytes += b
    return {
        "conv_tflops_total": round(flops / 1e12, 4),
        "achieved_tflops": round(flops / dt_s / 1e12, 2),
        "mxu_util_pct": round(100.0 * flops / dt_s / (_PEAK_TFLOPS * 1e12), 2),
        "hbm_gbps_min_model": round(min_bytes / dt_s / 1e9, 1),
        "hbm_gbps_gather_model": round(gather_bytes / dt_s / 1e9, 1),
        "hbm_util_pct_gather_model": round(
            100.0 * gather_bytes / dt_s / (_PEAK_GBPS * 1e9), 2
        ),
        "peak_tflops": _PEAK_TFLOPS,
        "peak_gbps": _PEAK_GBPS,
    }


def measure_phases(cfg, model, state, arrays, valid_voxels, iters):
    """Chained-dependency timing of each pipeline stage (same protocol as the
    main number; stages are cumulative jits, reported as differences)."""
    import time

    import jax
    import jax.numpy as jnp

    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
        PointGroup3HeadsNet,
    )
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        canonicalize,
        panoptic_forward,
    )

    feats0 = arrays[3]

    def chain(fn, n):
        feats, s = feats0, None
        for _ in range(n):
            feats, s = fn(state.params, state.batch_stats, feats, arrays)
        return float(s)

    def timed(fn):
        chain(fn, 1)
        t0 = time.perf_counter()
        chain(fn, 1)
        t1 = time.perf_counter()
        chain(fn, iters + 1)
        t2 = time.perf_counter()
        return max((t2 - t1) - (t1 - t0), 1e-9) / iters * 1e3  # ms

    def with_feats(arrays, feats):
        db = canonicalize(*arrays)
        return db._replace(feats=feats)

    @jax.jit
    def f_canon(params, stats, feats, arrays):
        db = with_feats(arrays, feats)
        s = jnp.sum(db.grid.keys.astype(jnp.float32))
        return feats + 1e-30 * s.astype(feats.dtype), s

    @jax.jit
    def f_hier(params, stats, feats, arrays):
        db = with_feats(arrays, feats)
        hier = build_hierarchy(
            db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
            brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
            win_maps=cfg.win_enabled,
        )
        dm0 = hier.down_maps[0]
        dm0_idx = dm0.idx if hasattr(dm0, "idx") else dm0
        s = sum(jnp.sum(m.astype(jnp.float32)) for m in
                [g.mask for g in hier.grids]) + jnp.sum(
            dm0_idx[:, 0].astype(jnp.float32)
        ) + jnp.sum(db.grid.keys.astype(jnp.float32))
        return feats + 1e-30 * s.astype(feats.dtype), s

    # clustering + ScoreNet at the reference's eval protocol: batch 1, one
    # eval-sized tile (the full-capacity batch would need the training-only
    # no-clustering path; clustering memory scales with the neighbor budget)
    import dataclasses

    cfg1 = dataclasses.replace(cfg, num_samples=1)
    model1 = PointGroup3HeadsNet(cfg1)
    vb1 = build_inputs(num_tiles=1, capacity=max(arrays[0].shape[0] // 4, 16384))
    from panopticsegforlargescalepointcloud_tpu.train.step import batch_arrays

    arrays1 = tuple(jnp.asarray(a) for a in batch_arrays(vb1))

    def mk_single(with_clustering):
        @jax.jit
        def f(params, stats, feats, arrays):
            db = canonicalize(*arrays)
            db = db._replace(feats=feats)
            hier = build_hierarchy(
                db.grid, cfg1.num_down, use_bricks=cfg1.use_bricks,
                brick_size=cfg1.brick_size, brick_capacity_factor=cfg1.brick_factor,
                win_maps=cfg1.win_enabled,
            )
            out, _ = panoptic_forward(
                cfg1, model1, {"params": params, "batch_stats": stats}, db, hier,
                train=False, with_clustering=with_clustering,
            )
            s = jnp.sum(out.semantic_logits)
            if out.cluster_scores is not None:
                s = s + jnp.sum(out.cluster_scores)
            return feats + 1e-30 * s.astype(feats.dtype), s
        return f

    def chain1(fn, n):
        feats, s = arrays1[3], None
        for _ in range(n):
            feats, s = fn(state.params, state.batch_stats, feats, arrays1)
        return float(s)

    def timed1(fn):
        chain1(fn, 1)
        t0 = time.perf_counter()
        chain1(fn, 1)
        t1 = time.perf_counter()
        chain1(fn, iters + 1)
        t2 = time.perf_counter()
        return max((t2 - t1) - (t1 - t0), 1e-9) / iters * 1e3

    t_canon = timed(f_canon)
    t_hier = timed(f_hier)
    t_tile_base = timed1(mk_single(False))
    t_tile_full = timed1(mk_single(True))

    # host-side block merging on representative synthetic outputs
    import numpy as np

    from panopticsegforlargescalepointcloud_tpu.eval.merge import SceneAccumulator

    rng = np.random.default_rng(0)
    n_scene = 400_000
    scene_pos = rng.uniform(0, 100, (n_scene, 3)).astype(np.float32)
    acc = SceneAccumulator(scene_pos, cfg.num_classes)
    n_tile = 30_000
    t0 = time.perf_counter()
    tiles = 8
    for i in range(tiles):
        ids = rng.choice(n_scene, n_tile, replace=False).astype(np.int64)
        logits = rng.normal(size=(n_tile, cfg.num_classes)).astype(np.float32)
        clusters = [
            np.arange(j * 300, (j + 1) * 300, dtype=np.int64) % n_tile
            for j in range(24)
        ]
        acc.add_tile(ids, logits, ids, clusters, None, th_merge=0.1)
    t_merge = (time.perf_counter() - t0) / tiles * 1e3

    return {
        "canonicalize": round(t_canon, 2),
        "hierarchy_maps": round(t_hier - t_canon, 2),
        "eval_tile_backbone": round(t_tile_base, 2),
        "eval_tile_cluster_scorenet": round(t_tile_full - t_tile_base, 2),
        "block_merge_host_per_tile": round(t_merge, 2),
    }


def measure_e2e(num_devices: int = 1):
    """End-to-end full-scene panoptic inference wall-clock on a synthetic
    FOR-instance-style forest (~500k points): tiling -> per-tile forward
    (clustering + ScoreNet) -> block merge -> finalise -> PQ report. The
    BASELINE.md anchor for the "v5e-8 beats reference single-A100" target;
    run with BENCH_E2E=1 (and BENCH_E2E_DEVICES=D for the mesh path)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp
    import optax

    from panopticsegforlargescalepointcloud_tpu.data import (
        PanopticFileDataset,
        TREEINS_SPEC,
        collate_tiles,
    )
    from panopticsegforlargescalepointcloud_tpu.data.ply import write_ply
    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
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

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        # ~35x35 m forest, ~100 trees, ~500k points
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
        ds = PanopticFileDataset(
            TREEINS_SPEC, [ply], grid_size=0.2, radius=8.0, keep_raw=True,
        )
        # the SHIPPED treeins flagship config (clustering/scorer budgets come
        # from the yaml; fractional rg cap resolves against the eval tile)
        cfg, ycfg = shipped_config("treeins_rad8", num_samples=1)
        # BENCH_E2E_BITS=x,y,z (A/B override): grouped dispatch at g>=4
        # needs a wider proposal-id field than the default (7,7,9) layout -
        # the config validation names the required split
        if os.environ.get("BENCH_E2E_BITS"):
            bits = tuple(
                int(b) for b in os.environ["BENCH_E2E_BITS"].split(",")
            )
            cfg = dataclasses.replace(cfg, scorer_bits=bits)
        capacity = int(ycfg["data"].get("eval_voxel_capacity", 32768))
        model = PointGroup3HeadsNet(cfg)
        tile, _ = ds.test_tiles(0)[0]
        vb = collate_tiles([tile], capacity=capacity, num_tiles=1)
        db, hier = prepare_example(batch_arrays(vb), cfg.num_down)
        state = init_state(
            cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0)
        )
        mesh = None
        if num_devices > 1:
            from panopticsegforlargescalepointcloud_tpu.parallel import make_mesh

            mesh = make_mesh(jax.devices()[:num_devices])
        # BENCH_E2E_GROUP=g batches g tiles per single-device dispatch
        # (FullSceneEvaluator tiles_per_dispatch; exact - tested parity)
        group = int(os.environ.get("BENCH_E2E_GROUP", "1"))
        ev = FullSceneEvaluator(
            cfg, model, state.params, state.batch_stats, ds,
            capacity=capacity, mesh=mesh,
            tiles_per_dispatch=group if mesh is None else 1,
        )
        out1 = os.path.join(tmp, "warm")
        ev.run(out_dir=out1, ply_output=False)  # compile + warm
        t0 = time.perf_counter()
        ev.run(out_dir=os.path.join(tmp, "timed"), ply_output=False)
        wall = time.perf_counter() - t0
        n_pts = len(ds.raw_clouds[0]["pos"])
        n_tiles = len(ds.test_tiles(0))
        rec = {
            "scene_points": n_pts,
            "tiles": n_tiles,
            "devices": num_devices,
            "e2e_scene_s": round(wall, 2),
            "e2e_points_per_s": round(n_pts / wall, 1),
            "scenes_per_hour": round(3600.0 / wall, 2),
        }
        if group > 1:
            rec["tiles_per_dispatch"] = group
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _write_e2e(e2e):
    """bench_e2e.json keeps one record per device count (the CPU-mesh
    scaling record next to the real-chip number)."""
    path = os.path.join(os.path.dirname(__file__), "bench_e2e.json")
    runs = []
    if os.path.exists(path):
        old = json.load(open(path))
        runs = old["runs"] if isinstance(old, dict) and "runs" in old else [old]
    key = lambda r: (r.get("devices"), r.get("platform"),
                     r.get("tiles_per_dispatch", 1))
    runs = [r for r in runs if key(r) != key(e2e)]
    runs.append(e2e)
    runs.sort(key=lambda r: (r.get("platform", ""), r.get("devices", 1),
                             r.get("tiles_per_dispatch", 1)))
    with open(path, "w") as f:
        json.dump({"runs": runs}, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    # sitecustomize pins JAX_PLATFORMS=axon with jax pre-imported;
    # PST_PLATFORM/PST_CPU_DEVICES re-target after import (as train.py)
    if os.environ.get("PST_CPU_DEVICES"):
        jax.config.update("jax_num_cpu_devices", int(os.environ["PST_CPU_DEVICES"]))
    if os.environ.get("PST_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PST_PLATFORM"])

    if os.environ.get("BENCH_E2E_ONLY"):
        # scaling-record mode: skip the forward bench (e.g. the 8-virtual-
        # device CPU mesh, where the single-chip number is meaningless)
        e2e = measure_e2e(int(os.environ.get("BENCH_E2E_DEVICES", "1")))
        e2e["platform"] = jax.devices()[0].platform
        _write_e2e(e2e)
        print(json.dumps(e2e))
        return

    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
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
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    # the SHIPPED NPM3D flagship config (Setting IV yaml + npm3d data yaml:
    # 9 classes, 0.18 m cluster radius, yaml clustering/scorer budgets);
    # BENCH_* env knobs remain available for A/B experiments only
    over = {}
    if os.environ.get("BENCH_GEMM"):
        over["gemm_mode"] = os.environ["BENCH_GEMM"]
    if os.environ.get("BENCH_RG_CAP"):
        over["rg_point_cap"] = float(os.environ["BENCH_RG_CAP"])
    if os.environ.get("BENCH_SCORER_MULT"):
        over["scorer_capacity_mult"] = float(os.environ["BENCH_SCORER_MULT"])
    cfg, ycfg = shipped_config(
        "npm3d-sparseconv_grid_012_R_16_cylinder_area1",
        num_samples=num_tiles, **over,
    )
    capacity = int(
        os.environ.get("BENCH_CAPACITY")
        or ycfg["data"].get("voxel_capacity", 131072)
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
            win_maps=cfg.win_enabled,
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

    # absolute hardware anchor (exact conv FLOPs from the real kernel maps)
    hw = hw_utilization(cfg, hier, dt)
    import sys

    print("hw utilization:", json.dumps(hw), file=sys.stderr)
    with open(os.path.join(os.path.dirname(__file__), "bench_hw.json"), "w") as f:
        json.dump(
            {"valid_voxels": valid_voxels, "ms_per_forward": dt * 1e3, **hw},
            f, indent=1,
        )

    if os.environ.get("BENCH_PHASES"):
        phases = measure_phases(cfg, model, state, arrays, valid_voxels, iters)
        full = dt * 1e3  # canon + hier + backbone + heads
        phases["backbone_heads"] = round(
            full - phases["canonicalize"] - phases["hierarchy_maps"], 2
        )
        import sys

        print("per-phase split (ms):", json.dumps(phases), file=sys.stderr)
        with open(os.path.join(os.path.dirname(__file__), "bench_phases.json"), "w") as f:
            json.dump({"valid_voxels": valid_voxels, "ms": phases}, f, indent=1)

    if os.environ.get("BENCH_E2E"):
        import sys

        e2e = measure_e2e(int(os.environ.get("BENCH_E2E_DEVICES", "1")))
        e2e["platform"] = jax.devices()[0].platform
        print("end-to-end scene:", json.dumps(e2e), file=sys.stderr)
        _write_e2e(e2e)

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
                # absolute anchors (bench_hw.json has the full model):
                # exact conv FLOPs/s over the v5e bf16 MXU peak, and the
                # row-gather traffic model over the 819 GB/s HBM peak
                "mxu_util_pct": hw["mxu_util_pct"],
                "hbm_gbps_gather_model": hw["hbm_gbps_gather_model"],
            }
        )
    )


if __name__ == "__main__":
    main()
