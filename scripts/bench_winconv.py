"""Windowed Pallas conv vs row-gather conv on real bench-shape kernel maps.

Builds the bench input batch (131k voxels), takes the REAL level-0/1/2
submanifold + strided maps from the hierarchy, and times sparse_conv (current
default) against windowed_conv (ops/winconv.py) - forward and forward+grad.
Also reports each map's correction count (out-of-window entries) to validate
the window-spread assumption on realistic data.

Timing protocol: see bench.py (chained dependency, 1 vs N+1 difference).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = 8
TR = int(os.environ.get("PST_WIN_TR", "256"))
WM = int(os.environ.get("PST_WIN_W", "512"))
UM = int(os.environ.get("PST_WIN_U", "4096"))


def measure(step, x0):
    def run(n):
        x, s = x0, None
        for _ in range(n):
            x, s = step(x)
        return float(s)

    run(1)
    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter()
    run(ITERS + 1)
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS


def main():
    from bench import build_inputs
    from panopticsegforlargescalepointcloud_tpu.ops.conv import sparse_conv
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
        make_windowed, supports_windowing, windowed_conv,
    )
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays, prepare_example,
    )

    rng = np.random.default_rng(0)
    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db, hier = prepare_example(arrays, 6)
    print(f"device: {jax.devices()[0]}")

    cases = []
    for lvl, c in [(0, 16), (1, 32), (2, 64)]:
        cases.append((f"subm L{lvl} C={c}", hier.bricks[lvl], hier.bricks[lvl],
                      hier.grids[lvl].capacity, hier.grids[lvl].capacity, c, c))
    # strided: down (coarse rows gather fine) and up (fine rows gather coarse)
    cases.append(("down L0->1 C=16", hier.down_maps[0], hier.up_maps[0],
                  hier.grids[1].capacity, hier.grids[0].capacity, 16, 16))
    cases.append(("up   L1->0 C=32", hier.up_maps[0], hier.down_maps[0],
                  hier.grids[0].capacity, hier.grids[1].capacity, 32, 32))

    x0 = jnp.asarray(rng.normal(size=(8, 16)), jnp.bfloat16)

    for name, idx, idx_t, n_out, n_in, cin, cout in cases:
        idx = jnp.asarray(idx)
        idx_t = jnp.asarray(idx_t)
        feats = jnp.asarray(rng.normal(size=(n_in, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.2, jnp.bfloat16)
        wr = WM if n_out >= n_in else max(WM, 8 * TR)
        ur = max(UM, 2 * wr)
        wr_t = max(WM, 8 * TR)
        ur_t = max(UM, 2 * wr_t)
        if not (supports_windowing(n_out, n_in, TR, ur)
                and supports_windowing(n_in, n_out, TR, ur_t)):
            print(f"{name}: windowing unsupported at ({n_out=}, {n_in=})")
            continue
        wm = jax.jit(lambda i=idx, ni=n_in, wr=wr, ur=ur: make_windowed(i, ni, TR, wr, ur))()
        wm_t = jax.jit(lambda i=idx_t, no=n_out, w2=wr_t, u2=ur_t: make_windowed(i, no, TR, w2, u2))()
        print(f"{name}: corr={int(wm.corr_count)} ovf={int(wm.overflow)} "
              f"corr_t={int(wm_t.corr_count)} ovf_t={int(wm_t.overflow)}")

        def scal(x):
            return (x[0, 0] * jnp.bfloat16(1e-30)).astype(jnp.bfloat16)

        @jax.jit
        def f_rows(x):
            f = feats + scal(x)
            out = sparse_conv(f, idx, w, mode="loop", out_dtype=jnp.float32,
                              nbr_idx_t=idx_t)
            return x + scal(out[:8, :16].astype(jnp.bfloat16)), jnp.sum(out[0])

        @jax.jit
        def f_win(x):
            f = feats + scal(x)
            out = windowed_conv(f, wm, w, wm_t)
            return x + scal(out[:8, :16].astype(jnp.bfloat16)), jnp.sum(out[0])

        @jax.jit
        def g_rows(x):
            f = feats + scal(x)
            l, gf = jax.value_and_grad(
                lambda ff: jnp.sum(sparse_conv(ff, idx, w, mode="loop",
                                               out_dtype=jnp.float32,
                                               nbr_idx_t=idx_t) ** 2)
            )(f)
            return x + scal(gf[:8, :16]), l

        @jax.jit
        def g_win(x):
            f = feats + scal(x)
            l, gf = jax.value_and_grad(
                lambda ff: jnp.sum(windowed_conv(ff, wm, w, wm_t) ** 2)
            )(f)
            return x + scal(gf[:8, :16]), l

        tr_ = measure(f_rows, x0) * 1e3
        tw = measure(f_win, x0) * 1e3
        gr_ = measure(g_rows, x0) * 1e3
        gw = measure(g_win, x0) * 1e3
        print(f"  fwd  rows {tr_:8.3f} ms | win {tw:8.3f} ms | {tr_/tw:5.2f}x")
        print(f"  f+b  rows {gr_:8.3f} ms | win {gw:8.3f} ms | {gr_/gw:5.2f}x")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
