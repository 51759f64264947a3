"""Localize the winconv C>=64 composite-backward anomaly (PLAN.md r3).

scripts/bench_winconv.py showed f+b through the windowed kernel at C=64
costing ~22.9 ms while the summed parts (fwd + dX-through-transpose-map +
dW) reconstruct to ~5 ms. This script times every part of the custom-vjp
backward IN ISOLATION and in composition, at C in {16, 32, 64, 128}, on the
REAL level maps:

  fwd          _run_fwd + correction (the forward the vjp replays nothing of)
  dX           _run_fwd(g, W^T) through the transpose map + its correction
  dW           _run_dw + _corr_dw
  dX+dW        one jit running both (the actual _winconv_tm_bwd body)
  vjp          jax.vjp-built backward alone (f32 cotangent in)
  f+b          value_and_grad composite (what bench_winconv measures)

If dX+dW ~ dX + dW but vjp >> dX+dW, the cost is in what AD adds around the
custom_vjp (residual saves / dtype casts / layout changes). If f+b >> fwd +
vjp, the composite jit scheduling is at fault.

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
TR = 256


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
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS * 1e3  # ms


def main():
    from bench import build_inputs
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
        _corr_apply,
        _corr_dw,
        _flip_t,
        _run_dw,
        _run_fwd,
        make_windowed,
        supports_windowing,
        windowed_conv,
    )
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        prepare_example,
    )

    rng = np.random.default_rng(0)
    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db, hier = prepare_example(arrays, 6)
    print(f"device: {jax.devices()[0]}")

    # submanifold maps (self-transpose) at levels 0..3 = C 16/32/64/128 in
    # the paper plan's ResBlocks
    for lvl, c in [(0, 16), (1, 32), (2, 64), (3, 128)]:
        idx = jnp.asarray(hier.bricks[lvl].idx if hasattr(hier.bricks[lvl], "idx")
                          else hier.bricks[lvl])
        n = idx.shape[0]
        if not supports_windowing(n, n, TR, 2048):
            print(f"L{lvl} C={c}: unsupported shape n={n}")
            continue
        wm = jax.jit(lambda i=idx, nn=n: make_windowed(i, nn, TR, 512, 2048))()
        feats = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.2, jnp.bfloat16)
        g32 = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)

        def scal(v):
            return (v.reshape(-1)[0] * 1e-30).astype(jnp.float32)

        def chain(out, x):
            return x + scal(out), jnp.sum(out.reshape(-1)[:4])

        wt = _flip_t(w)

        @jax.jit
        def t_fwd(x):
            f = feats + x[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)
            out = _corr_apply(f, w, wm, _run_fwd(f, w, wm))
            return chain(out, x)

        @jax.jit
        def t_dx(x):
            g = g32 + x[0, 0] * 1e-30
            gf = _corr_apply(g, wt, wm, _run_fwd(g, wt, wm))
            return chain(gf, x)

        @jax.jit
        def t_dw(x):
            g = g32 + x[0, 0] * 1e-30
            gw = _run_dw(feats, g, wm) + _corr_dw(feats, g, wm)
            return chain(gw, x)

        @jax.jit
        def t_dxdw(x):
            g = g32 + x[0, 0] * 1e-30
            gf = _corr_apply(g, wt, wm, _run_fwd(g, wt, wm))
            gw = _run_dw(feats, g, wm) + _corr_dw(feats, g, wm)
            return x + scal(gf) + scal(gw), jnp.sum(gf.reshape(-1)[:4])

        def loss(f):
            return jnp.sum(windowed_conv(f, wm, w, wm) ** 2)

        @jax.jit
        def t_vjp(x):
            f = feats + x[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)
            _, pull = jax.vjp(lambda ff: windowed_conv(ff, wm, w, wm), f)
            (gf,) = pull(g32)
            return chain(gf.astype(jnp.float32), x)

        @jax.jit
        def t_fb(x):
            f = feats + x[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)
            l, gf = jax.value_and_grad(loss)(f)
            return chain(gf.astype(jnp.float32), x), l

        def t_fb2(x):
            (xn, s), _ = t_fb(x)
            return xn, s

        parts = {
            "fwd": measure(t_fwd, x0),
            "dX": measure(t_dx, x0),
            "dW": measure(t_dw, x0),
            "dX+dW": measure(t_dxdw, x0),
            "vjp(bwd only-ish)": measure(t_vjp, x0),
            "f+b composite": measure(t_fb2, x0),
        }
        print(f"L{lvl} C={c} n={n} corr={int(wm.corr_count)}:")
        for k, v in parts.items():
            print(f"    {k:18s} {v:8.3f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
