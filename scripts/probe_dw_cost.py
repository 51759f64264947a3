"""Amortized per-op cost of the windowed dW kernel on the real L0 map.

bench_winconv_bwd (single dispatch per call) read dW at 5.7 ms on the new
toolchain vs the r4 record of 2.85 - but single-call readings on this tunnel
floor at ~2 ms of dispatch latency and turn noisy. This probe chains CH dW
ops inside ONE jit (data-dependent: each op's scalar feeds the next op's
input perturbation) so dispatch is amortized and the per-OP cost remains,
for both the plain-[N,C] and the lane-packed upstream-grad form.

Usage: timeout 1800 python scripts/probe_dw_cost.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 8
CH = 8
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
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
        _run_dw,
        _run_fwd,
        make_windowed,
        pack_feats,
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

    b0 = hier.bricks[0]
    idx = jnp.asarray(b0.idx if hasattr(b0, "idx") else b0)
    n = idx.shape[0]
    wm = jax.jit(lambda: make_windowed(idx, n, TR, 512, 2048))()

    for c in (16, 32):
        fplain = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        fpack = pack_feats(fplain)
        gplain = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
        gpack = pack_feats(gplain.astype(jnp.bfloat16)).astype(jnp.float32)
        w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.2, jnp.bfloat16)
        x0 = jnp.zeros((8, 8), jnp.float32)

        def chained(op):
            def step(x):
                s = x[0, 0]
                for _ in range(CH):
                    out = op(s)
                    s = jnp.sum(out.reshape(-1)[:4].astype(jnp.float32)) * 1e-30
                return x + s, s

            return jax.jit(step)

        rows = [
            (
                "dW plain g",
                chained(
                    lambda s: _run_dw(
                        fplain + s.astype(jnp.bfloat16), gplain + s, wm
                    )
                ),
            ),
            (
                "dW packed f+g",
                chained(
                    lambda s: _run_dw(
                        fpack.replace(
                            data=fpack.data + s.astype(fpack.dtype)
                        ),
                        gpack.replace(data=gpack.data + s.astype(gpack.dtype)),
                        wm,
                    )
                ),
            ),
            (
                "fwd packed (ref)",
                chained(
                    lambda s: _run_fwd(
                        fpack.replace(
                            data=fpack.data + s.astype(fpack.dtype)
                        ),
                        w,
                        wm,
                        out_packed=True,
                    ).data
                ),
            ),
        ]
        for name, f in rows:
            try:
                ms = measure(f, x0)
                print(f"C={c:3d} {name:16s} {ms / CH:7.3f} ms/op")
            except Exception as e:
                print(
                    f"C={c:3d} {name:16s} FAILED {type(e).__name__}: "
                    f"{str(e)[:160]}"
                )


if __name__ == "__main__":
    main()
