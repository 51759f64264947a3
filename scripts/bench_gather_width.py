"""Microbenchmark: gather/scatter throughput vs ROW WIDTH on this TPU.

Decides the submanifold-conv formulation for round 3 (PLAN.md): the existing
loop conv does 27 gathers of [N] rows from a [N, 16] bf16 table; the
brick-GEMM candidate does 27 gathers of [NC] rows from a [NC, 128] bf16 table
(8 voxels x 16 ch packed per row, full 128-lane rows -> no (8,128) padding
waste) followed by [8Ci, 8Co] GEMMs. Which side wins is purely a question of
how per-row gather cost scales with row width, which this script measures.

Timing: chained data dependency + scalar fetch, 1-iter vs (iters+1)-iter
difference (block_until_ready is unreliable on axon; see bench.py).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8
K = 27


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


def scal(x):
    return (x[0, 0] * jnp.bfloat16(1e-30)).astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")
    x0 = jnp.asarray(rng.normal(size=(8, 16)), jnp.bfloat16)

    @jax.jit
    def step_noop(x):
        return x + jnp.bfloat16(1.0), jnp.sum(x[0].astype(jnp.float32))

    print(f"dispatch/no-op: {measure(step_noop, x0)*1e3:.3f} ms")

    # ---- 1) ns/row vs row width: gather R rows from [T, W] bf16 ----
    R = 131072
    T = 131072
    print("\n== gather R=131072 rows from [131072, W] bf16, banded idx ==")
    base = np.arange(R)[:, None]
    idx_np = np.clip(base + rng.integers(-2000, 2000, size=(R, 1)), 0, T - 1)
    idx1 = jnp.asarray(idx_np[:, 0], jnp.int32)
    for w in (8, 16, 32, 64, 128, 256):
        tab = jnp.asarray(rng.normal(size=(T, w)), jnp.bfloat16)

        @jax.jit
        def step(x, tab=tab):
            f = tab + scal(x)
            g = jnp.take(f, idx1, axis=0)
            return g[:8, :16].astype(jnp.bfloat16), jnp.sum(
                g[0].astype(jnp.float32)
            )

        dt = measure(step, x0)
        ns_row = dt / R * 1e9
        gbs = R * w * 2 / dt / 1e9
        print(f"  W={w:4d} ({w*2:4d}B/row): {dt*1e3:7.3f} ms  "
              f"{ns_row:6.2f} ns/row  {gbs:7.1f} GB/s(useful)")

    # ---- 2) the two conv formulations, level-0 scale ----
    N, C = 131072, 16
    NC = 98304  # level-1 capacity (brick table)
    feats = jnp.asarray(rng.normal(size=(N, C)), jnp.bfloat16)
    w27 = jnp.asarray(rng.normal(size=(K, C, C)), jnp.bfloat16)
    idx_vox = jnp.asarray(
        np.clip(base + rng.integers(-2000, 2000, size=(N, K)), 0, N - 1),
        jnp.int32,
    )

    @jax.jit
    def conv_loop(x):
        f = feats + scal(x)
        out = jnp.zeros((N, C), jnp.float32)
        for k in range(K):
            g = jnp.take(f, idx_vox[:, k], axis=0)
            out = out + jnp.dot(g, w27[k], preferred_element_type=jnp.float32)
        return out[:8, :16].astype(jnp.bfloat16), jnp.sum(out[0])

    print("\n== conv formulations at N=131072, C=16 ==")
    dt = measure(conv_loop, x0)
    print(f"  loop conv (27 x [N,16] row gathers + GEMMs): {dt*1e3:7.3f} ms")

    # brick-GEMM: dense [NC, 8*C] table, 27 brick-row gathers + [128,128] GEMMs
    dense = jnp.asarray(rng.normal(size=(NC, 8 * C)), jnp.bfloat16)
    bbase = np.arange(NC)[:, None]
    idx_brick = jnp.asarray(
        np.clip(bbase + rng.integers(-300, 300, size=(NC, K)), 0, NC - 1),
        jnp.int32,
    )
    bmats = jnp.asarray(rng.normal(size=(K, 8 * C, 8 * C)), jnp.bfloat16)

    @jax.jit
    def conv_brick(x):
        d = dense + scal(x)
        out = jnp.zeros((NC, 8 * C), jnp.float32)
        for k in range(K):
            g = jnp.take(d, idx_brick[:, k], axis=0)
            out = out + jnp.dot(g, bmats[k], preferred_element_type=jnp.float32)
        return out[:8, :16].astype(jnp.bfloat16), jnp.sum(out[0])

    dt = measure(conv_brick, x0)
    print(f"  brick-GEMM core (27 x [NC,128] gathers + [128,128] GEMMs): "
          f"{dt*1e3:7.3f} ms   (NC={NC})")

    # edge costs of the brick formulation
    p8s_np = rng.permutation(NC * 8)[:N].astype(np.int32)
    p8s = jnp.asarray(np.sort(p8s_np))

    @jax.jit
    def edge_build(x):
        f = feats + scal(x)
        d = jnp.zeros((NC * 8, C), jnp.bfloat16).at[p8s].set(f)
        return d[:8, :16], jnp.sum(d[0].astype(jnp.float32))

    @jax.jit
    def edge_extract(x):
        d = dense.reshape(NC * 8, C) + scal(x)
        r = jnp.take(d, p8s, axis=0)
        return r[:8, :16], jnp.sum(r[0].astype(jnp.float32))

    print(f"  edge scatter [N,16]->[NC*8,16]: {measure(edge_build, x0)*1e3:7.3f} ms")
    print(f"  edge gather  [NC*8,16]->[N,16]: {measure(edge_extract, x0)*1e3:7.3f} ms")

    # ---- 3) deeper level: C=32, N=98304, NC=41984 ----
    N2, C2, NC2 = 98304, 32, 41984
    feats2 = jnp.asarray(rng.normal(size=(N2, C2)), jnp.bfloat16)
    w27b = jnp.asarray(rng.normal(size=(K, C2, C2)), jnp.bfloat16)
    idx2 = jnp.asarray(
        np.clip(np.arange(N2)[:, None] + rng.integers(-2000, 2000, size=(N2, K)),
                0, N2 - 1), jnp.int32)

    @jax.jit
    def conv_loop2(x):
        f = feats2 + scal(x)
        out = jnp.zeros((N2, C2), jnp.float32)
        for k in range(K):
            g = jnp.take(f, idx2[:, k], axis=0)
            out = out + jnp.dot(g, w27b[k], preferred_element_type=jnp.float32)
        return out[:8, :16].astype(jnp.bfloat16), jnp.sum(out[0])

    dense2 = jnp.asarray(rng.normal(size=(NC2, 8 * C2)), jnp.bfloat16)
    idxb2 = jnp.asarray(
        np.clip(np.arange(NC2)[:, None] + rng.integers(-300, 300, size=(NC2, K)),
                0, NC2 - 1), jnp.int32)
    bmats2 = jnp.asarray(rng.normal(size=(K, 8 * C2, 8 * C2)), jnp.bfloat16)

    @jax.jit
    def conv_brick2(x):
        d = dense2 + scal(x)
        out = jnp.zeros((NC2, 8 * C2), jnp.float32)
        for k in range(K):
            g = jnp.take(d, idxb2[:, k], axis=0)
            out = out + jnp.dot(g, bmats2[k], preferred_element_type=jnp.float32)
        return out[:8, :16].astype(jnp.bfloat16), jnp.sum(out[0])

    print("\n== level-1 scale: N=98304 C=32 ==")
    print(f"  loop conv:       {measure(conv_loop2, x0)*1e3:7.3f} ms")
    print(f"  brick-GEMM core: {measure(conv_brick2, x0)*1e3:7.3f} ms (NC={NC2})")


if __name__ == "__main__":
    main()
