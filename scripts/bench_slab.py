"""Microbenchmark: 3-row slab gathers vs row gathers for the sparse conv.

Keys are z-fastest sorted, so the three z-offsets of one (dx,dy) column live
in contiguous rows: a conv can gather 9 slabs of 3 rows instead of 27 single
rows. PLAN.md's gather cost model says row gathers are latency-bound (~2-3.6
ns/row regardless of width <= 192B), so 3x fewer, 3x wider gathers should
approach a 3x gather-time win. This script checks that XLA's TPU lowering of
lax.gather with slice_sizes=(3, C) actually delivers it, and prices the
realignment selects + 3C-contraction GEMMs of the exact slab conv.

Timing protocol: see bench.py (chained dependency, 1 vs N+1 difference).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def run_chain(step, x0, n):
    x, s = x0, None
    for _ in range(n):
        x, s = step(x)
    return float(s)


def measure(step, x0):
    run_chain(step, x0, 1)
    t0 = time.perf_counter()
    run_chain(step, x0, 1)
    t1 = time.perf_counter()
    run_chain(step, x0, ITERS + 1)
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS


def slab_gather(feats, starts, slab=3):
    """[N_idx] start rows -> [N_idx, slab, C] contiguous-row slices."""
    n, c = feats.shape
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    idx = jnp.minimum(starts, n - slab)[:, None]
    return jax.lax.gather(
        feats, idx, dn, slice_sizes=(slab, c), mode=jax.lax.GatherScatterMode.CLIP
    )


def main():
    rng = np.random.default_rng(0)
    shapes = [
        (131072, 16, 16),
        (98304, 32, 32),
        (49152, 64, 64),
        (24576, 96, 96),
    ]
    print(f"device: {jax.devices()[0]}")
    n0 = 131072
    x0 = jnp.asarray(rng.normal(size=(n0, 16)), jnp.bfloat16)

    for n, cin, cout in shapes:
        feats = jnp.asarray(rng.normal(size=(n, cin)), jnp.bfloat16)
        band = 2000
        base = np.arange(n)[:, None] + rng.integers(-band, band, size=(n, 27))
        idx27 = jnp.asarray(np.clip(base, 0, n - 1).astype(np.int32))
        idx9 = idx27[:, ::3]  # [n, 9] slab starts
        # per-slab z-delta of each slot: random in {0,1,2} + validity
        deltas = jnp.asarray(rng.integers(0, 3, size=(n, 9, 3)), jnp.int32)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)), jnp.bfloat16)
        w9 = w.reshape(9, 3 * cin, cout)

        def scal(x):
            return (x[0, 0] * jnp.bfloat16(1e-30)).astype(jnp.bfloat16)

        @jax.jit
        def step_loop27(x):
            f = feats + scal(x)
            out = jnp.zeros((n, cout), jnp.float32)
            for kk in range(27):
                gk = jnp.take(f, idx27[:, kk], axis=0)
                out = out + jnp.dot(gk, w[kk], preferred_element_type=jnp.float32)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def step_slab_raw(x):
            # gather cost only: 9 slab gathers, cheap reduce
            f = feats + scal(x)
            out = jnp.zeros((n, cin), jnp.float32)
            for col in range(9):
                g = slab_gather(f, idx9[:, col])  # [n, 3, cin]
                out = out + jnp.sum(g, axis=1)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def step_slab_conv(x):
            # full exact-conv shape: gather, realign slots by delta, GEMM 3C
            f = feats + scal(x)
            out = jnp.zeros((n, cout), jnp.float32)
            for col in range(9):
                g = slab_gather(f, idx9[:, col])  # [n, 3, cin]
                d = deltas[:, col]  # [n, 3]
                ga = jnp.zeros_like(g)
                for dd in range(3):
                    sel = (d == dd)[..., None]  # [n, 3, 1]
                    ga = ga.at[:, dd].set(
                        jnp.sum(jnp.where(sel, g, jnp.bfloat16(0)), axis=1)
                    )
                out = out + jnp.dot(
                    ga.reshape(n, 3 * cin), w9[col],
                    preferred_element_type=jnp.float32,
                )
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def step_slab_one(x):
            # all 9 columns in ONE lax.gather call: [n*9] starts
            f = feats + scal(x)
            g = slab_gather(f, idx9.reshape(-1))  # [n*9, 3, cin]
            g = g.reshape(n, 9, 3, cin)
            out = jnp.sum(g.astype(jnp.float32), axis=(1, 2))
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        t27 = measure(step_loop27, x0)
        traw = measure(step_slab_raw, x0)
        tconv = measure(step_slab_conv, x0)
        tone = measure(step_slab_one, x0)
        print(
            f"N={n:6d} C={cin:3d} | loop27 {t27*1e3:7.2f}"
            f" slab9-gather {traw*1e3:7.2f} slab9-conv {tconv*1e3:7.2f}"
            f" slab-one-call {tone*1e3:7.2f} ms"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
