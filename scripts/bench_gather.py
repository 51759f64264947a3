"""Microbenchmark: what do kernel-map gathers + GEMMs actually cost on this
TPU through this XLA version? Drives the sparse-conv kernel design (PLAN.md).

All steps carry the SAME small [N, 16] bf16 tensor (so per-call dispatch and
carry-transfer costs are identical and cancel in comparisons) and perturb
their big operands with a scalar derived from the carry to defeat CSE.

Timing: chained data dependency + scalar fetch, 1-iter vs (iters+1)-iter
difference (see bench.py docstring; block_until_ready is unreliable on axon).
"""

import sys
import time

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
    run_chain(step, x0, 1)  # compile + warm
    t0 = time.perf_counter()
    run_chain(step, x0, 1)
    t1 = time.perf_counter()
    run_chain(step, x0, ITERS + 1)
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS


def banded_indices(rng, n, k=27, band=2000):
    base = np.arange(n)[:, None] + rng.integers(-band, band, size=(n, k))
    return np.clip(base, 0, n - 1).astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    shapes = [
        (131072, 16, 16),
        (98304, 32, 32),
        (49152, 64, 64),
        (24576, 96, 96),
        (131072, 4, 16),
    ]
    k = 27
    print(f"device: {jax.devices()[0]}")

    n0 = 131072
    x0 = jnp.asarray(rng.normal(size=(n0, 16)), jnp.bfloat16)

    @jax.jit
    def step_noop(x):
        return x + jnp.bfloat16(1.0), jnp.sum(x[0].astype(jnp.float32))

    print(f"dispatch/no-op: {measure(step_noop, x0)*1e3:.3f} ms")

    for n, cin, cout in shapes:
        feats = jnp.asarray(rng.normal(size=(n, cin)), jnp.bfloat16)
        idx_rand = jnp.asarray(rng.integers(0, n, size=(n, k)), jnp.int32)
        idx_band = jnp.asarray(banded_indices(rng, n, k))
        w = jnp.asarray(rng.normal(size=(k, cin, cout)), jnp.bfloat16)
        wf = w.reshape(k * cin, cout)
        g0 = jnp.take(feats, idx_band, axis=0).reshape(n, k * cin)

        def scal(x):
            return (x[0, 0] * jnp.bfloat16(1e-30)).astype(jnp.bfloat16)

        def mk_take(idx):
            @jax.jit
            def step(x):
                f = feats + scal(x)
                g = jnp.take(f, idx, axis=0)
                red = jnp.max(g, axis=1)  # [n, cin] cheap reduce, defeats DCE
                s = jnp.sum(red[0].astype(jnp.float32))
                return x.at[0, 0].add(jnp.bfloat16(1e-30) * red[0, 0]), s
            return step

        @jax.jit
        def step_fused(x):
            f = feats + scal(x)
            g = jnp.take(f, idx_band, axis=0).reshape(n, k * cin)
            out = jnp.dot(g, wf, preferred_element_type=jnp.float32)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def step_loop(x):
            f = feats + scal(x)
            out = jnp.zeros((n, cout), jnp.float32)
            for kk in range(k):
                gk = jnp.take(f, idx_band[:, kk], axis=0)
                out = out + jnp.dot(gk, w[kk], preferred_element_type=jnp.float32)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def step_gemm(x):
            g = g0 + scal(x)
            out = jnp.dot(g, wf, preferred_element_type=jnp.float32)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def step_elem(x):
            g = g0 + scal(x)  # one elementwise pass over the [n, 27*cin] tensor
            s = jnp.sum(g[0].astype(jnp.float32))
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * g[0, 0]), s

        t_rand = measure(mk_take(idx_rand), x0)
        t_band = measure(mk_take(idx_band), x0)
        t_fused = measure(step_fused, x0)
        t_loop = measure(step_loop, x0)
        t_gemm = measure(step_gemm, x0)
        t_elem = measure(step_elem, x0)
        gb = n * k * cin * 2 / 1e9
        print(
            f"N={n:6d} Cin={cin:3d} Cout={cout:3d} | take_rand {t_rand*1e3:7.2f}"
            f" take_band {t_band*1e3:7.2f} fused {t_fused*1e3:7.2f}"
            f" loop {t_loop*1e3:7.2f} gemm {t_gemm*1e3:7.2f} elem {t_elem*1e3:7.2f} ms"
            f" | gathered {gb:.2f}GB -> band BW {gb/t_band:6.1f}GB/s"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
