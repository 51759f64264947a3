"""Microbenchmark: where does the backbone's non-gather time go?

Prices the per-offset validity select in loop-mode sparse_conv (vs a zero
pad row that makes -1 indices just gather zeros) and the MaskedBatchNorm
eval-mode passes, at the backbone's L0/L1 shapes. Drives ops/conv.py and
models/norm.py optimization (PLAN.md).

Timing protocol: see bench.py (chained dependency, 1 vs N+1 difference).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")
    for n, c in [(131072, 16), (98304, 32), (43008, 48)]:
        feats = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        band = 2000
        base = np.arange(n)[:, None] + rng.integers(-band, band, size=(n, 27))
        idx = np.clip(base, 0, n - 1).astype(np.int32)
        # ~10% invalid entries like real kernel maps
        inv = rng.random((n, 27)) < 0.1
        idx_m = jnp.asarray(np.where(inv, -1, idx))
        idx_z = jnp.asarray(np.where(inv, n, idx))  # point at the zero row
        w = jnp.asarray(rng.normal(size=(27, c, c)), jnp.bfloat16)
        mask = jnp.asarray(rng.random(n) > 0.05)
        mean = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        var = jnp.asarray(rng.random(c) + 0.5, jnp.float32)
        x0 = feats

        def scal(x):
            return (x[0, 0] * jnp.bfloat16(1e-30)).astype(jnp.bfloat16)

        @jax.jit
        def loop_masked(x):
            f = feats + scal(x)
            safe = jnp.maximum(idx_m, 0)
            valid = idx_m >= 0
            out = jnp.zeros((n, c), jnp.float32)
            for kk in range(27):
                gk = jnp.take(f, safe[:, kk], axis=0)
                gk = jnp.where(valid[:, kk, None], gk, jnp.bfloat16(0))
                out = out + jnp.dot(gk, w[kk], preferred_element_type=jnp.float32)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def loop_zeropad(x):
            f = feats + scal(x)
            fz = jnp.concatenate([f, jnp.zeros((1, c), f.dtype)])
            out = jnp.zeros((n, c), jnp.float32)
            for kk in range(27):
                gk = jnp.take(fz, idx_z[:, kk], axis=0)
                out = out + jnp.dot(gk, w[kk], preferred_element_type=jnp.float32)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def loop_unsafe(x):
            f = feats + scal(x)
            out = jnp.zeros((n, c), jnp.float32)
            for kk in range(27):
                gk = jnp.take(f, jnp.maximum(idx_m[:, kk], 0), axis=0)
                out = out + jnp.dot(gk, w[kk], preferred_element_type=jnp.float32)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def bn_eval(x):
            f = feats + scal(x)
            m = mask.astype(jnp.float32)[:, None]
            y = (f.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
            y = y * 1.01 + 0.01
            y = (y * m).astype(f.dtype)
            y = jax.nn.relu(y)
            s = jnp.sum(y[0].astype(jnp.float32))
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * y[0, 0]), s

        @jax.jit
        def bn_train_stats(x):
            f = feats + scal(x)
            m = mask.astype(jnp.float32)[:, None]
            xf = f.astype(jnp.float32) * m
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mu = jnp.sum(xf, axis=0) / cnt
            va = jnp.maximum(jnp.sum(xf * xf, axis=0) / cnt - mu * mu, 0.0)
            y = ((f.astype(jnp.float32) - mu) * jax.lax.rsqrt(va + 1e-5) * m).astype(f.dtype)
            s = jnp.sum(y[0].astype(jnp.float32))
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * y[0, 0]), s

        tm = measure(loop_masked, x0)
        tz = measure(loop_zeropad, x0)
        tu = measure(loop_unsafe, x0)
        tb = measure(bn_eval, x0)
        tt = measure(bn_train_stats, x0)
        print(
            f"N={n:6d} C={c:3d} | conv masked {tm*1e3:7.2f} zeropad {tz*1e3:7.2f}"
            f" unsafe {tu*1e3:7.2f} | bn-relu eval {tb*1e3:6.2f}"
            f" bn train {tt*1e3:6.2f} ms"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()


def bench_backward():
    """Price the conv backward: XLA turns the gather's VJP into scatter-adds;
    compare against the forward and against a hand transpose-map backward
    (gathers through the negated-offset map, no scatters)."""
    import jax

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]} (backward)")
    for n, c in [(131072, 16), (98304, 32)]:
        feats = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        band = 2000
        base = np.arange(n)[:, None] + rng.integers(-band, band, size=(n, 27))
        idx = np.clip(base, 0, n - 1).astype(np.int32)
        inv = rng.random((n, 27)) < 0.1
        idx_z = jnp.asarray(np.where(inv, n, idx))
        w = jnp.asarray(rng.normal(size=(27, c, c)), jnp.bfloat16)
        x0 = feats

        def scal(x):
            return (x[0, 0] * jnp.bfloat16(1e-30)).astype(jnp.bfloat16)

        def conv(f):
            fz = jnp.concatenate([f, jnp.zeros((1, c), f.dtype)])
            out = jnp.zeros((n, c), jnp.float32)
            for kk in range(27):
                gk = jnp.take(fz, idx_z[:, kk], axis=0)
                out = out + jnp.dot(gk, w[kk], preferred_element_type=jnp.float32)
            return out

        @jax.jit
        def step_fwd(x):
            out = conv(feats + scal(x))
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def step_bwd(x):
            gf = jax.grad(lambda f: jnp.sum(conv(f)))(feats + scal(x))
            s = jnp.sum(gf[0].astype(jnp.float32))
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * gf[0, 0].astype(jnp.bfloat16)), s

        @jax.jit
        def step_tmap(x):
            # hand backward: same-cost conv through the reversed map
            f = feats + scal(x)
            g = conv(f).astype(jnp.bfloat16)
            fz = jnp.concatenate([g, jnp.zeros((1, c), g.dtype)])
            wT = jnp.flip(w, axis=0).transpose(0, 2, 1)
            out = jnp.zeros((n, c), jnp.float32)
            for kk in range(27):
                gk = jnp.take(fz, idx_z[:, kk], axis=0)
                out = out + jnp.dot(gk, wT[kk], preferred_element_type=jnp.float32)
            s = jnp.sum(out[0])
            return x.at[0, 0].add(jnp.bfloat16(1e-30) * out[0, 0].astype(jnp.bfloat16)), s

        tf = measure(step_fwd, x0)
        tb = measure(step_bwd, x0)
        tt = measure(step_tmap, x0)
        print(
            f"N={n:6d} C={c:3d} | fwd {tf*1e3:7.2f} autodiff-bwd {tb*1e3:7.2f}"
            f" fwd+transpose-map {tt*1e3:7.2f} ms"
        )
        sys.stdout.flush()
