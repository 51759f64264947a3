"""Per-level conv timing with REAL kernel maps from the bench batch.

For each UNet level: time one submanifold conv at the level's (capacity,
channels) through the actual hierarchy maps, plus the stride-2 down and up
convs. Multiplied by per-level conv counts this reconstructs the backbone
wall split and shows which levels to attack (PLAN.md).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS


def main():
    from bench import build_inputs
    from panopticsegforlargescalepointcloud_tpu.ops.conv import sparse_conv
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        prepare_example,
    )

    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    if mode == "win":
        # windowed maps like the real eval path (hierarchy.windowify)
        from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import (
            build_hierarchy,
        )
        from panopticsegforlargescalepointcloud_tpu.train.step import canonicalize

        db = jax.jit(canonicalize)(*arrays)
        hier = jax.jit(
            lambda g: build_hierarchy(g, 6, win_maps=True)
        )(db.grid)
    else:
        db, hier = prepare_example(arrays, 6)
        hier = jax.tree_util.tree_map(jnp.asarray, hier)

    f = 16
    chans = [f * (i + 1) for i in range(7)]  # 16..112
    rng = np.random.default_rng(0)
    print(f"mode={mode} device={jax.devices()[0]}")
    total = 0.0
    for lvl in range(7):
        c = chans[lvl]
        n = hier.grids[lvl].capacity
        occ = int(np.asarray(hier.grids[lvl].mask).sum())
        smap = hier.bricks[lvl]  # row map
        w = jnp.asarray(rng.normal(size=(27, c, c)), jnp.bfloat16)
        feats = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)

        from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
            WindowedMap,
            windowed_conv,
        )

        def conv(x, map_, w_):
            if isinstance(map_, WindowedMap):
                return windowed_conv(x, map_, w_, out_dtype=jnp.bfloat16)
            return sparse_conv(
                x, map_, w_,
                mode="loop" if mode == "win" else mode,
                out_dtype=jnp.bfloat16,
            )

        def mk(map_, w_, nin, nout):
            @jax.jit
            def step(x):
                out = conv(x, map_, w_)
                s = jnp.sum(out[0].astype(jnp.float32))
                if nout == nin:
                    nxt = x + jnp.bfloat16(1e-30) * out
                else:
                    nxt = x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0])
                return nxt, s
            return step

        t_same = measure(mk(smap, w, n, n), feats)
        line = f"L{lvl} N={n:6d} occ={occ:6d} C={c:3d} same={t_same*1e3:7.2f}ms"
        if lvl < 6:
            nc = hier.grids[lvl + 1].capacity
            dmap = hier.down_maps[lvl]
            wdown = jnp.asarray(rng.normal(size=(27, c, c)), jnp.bfloat16)

            @jax.jit
            def step_down(x, dmap=dmap, wdown=wdown):
                out = conv(x, dmap, wdown)
                s = jnp.sum(out[0].astype(jnp.float32))
                return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0]), s

            umap = hier.up_maps[lvl]
            cup = chans[lvl + 1]
            wup = jnp.asarray(rng.normal(size=(27, cup, c)), jnp.bfloat16)
            fup = jnp.asarray(rng.normal(size=(nc, cup)), jnp.bfloat16)

            @jax.jit
            def step_up(x, umap=umap, wup=wup):
                out = conv(x, umap, wup)
                s = jnp.sum(out[0].astype(jnp.float32))
                return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0]), s

            t_down = measure(step_down, feats)
            t_up = measure(step_up, fup)
            line += f" down={t_down*1e3:7.2f}ms up={t_up*1e3:7.2f}ms"
            total += t_down + t_up
        # 5 same-level convs on the down path + 5 on the up path (approx)
        total += t_same * 9
        print(line)
        sys.stdout.flush()
    print(f"reconstructed conv total (9x same + down + up per level): {total*1e3:.1f}ms")


if __name__ == "__main__":
    main()
