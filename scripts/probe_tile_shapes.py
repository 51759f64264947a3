"""A/B the windowed-conv tile/window geometry (tr, w, u) on the real L0 map.

The kernel's per-tile cost is ~54 small MXU ops (27 one-hot gather GEMMs +
27 weight GEMMs) + one union DMA; at tr=256 the gather GEMM K-dim is
wp = w/p = 64 at C=16 - half-empty MXU passes - and the op-issue floor is
suspected to dominate (PLAN.md r4: ~71 ms trunk, kernels reconstruct to well
under half). Doubling tr halves the number of grid steps (issue overhead,
DMA waits) at the price of a somewhat larger per-offset window w; u grows by
tr. Overflow counts tell whether a geometry still captures real maps exactly
(corr entries are exactly repaired, but nonzero counts mean the windows are
undersized for the data).

Usage: timeout 1200 python scripts/probe_tile_shapes.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 16


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
    from panopticsegforlargescalepointcloud_tpu.ops import winconv as wc
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
    print(f"L0 rows: {n}")

    c = 16
    feats = wc.pack_feats(jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16))
    w27 = jnp.asarray(rng.normal(size=(27, c, c)) * 0.2, jnp.bfloat16)
    x0 = jnp.zeros((8, 8), jnp.float32)

    geoms = [
        (256, 512, 2048),  # shipped
        (256, 384, 1920),  # tighter per-offset window
        (512, 640, 2304),
        (512, 768, 2432),
        (1024, 1280, 3072),
    ]
    ref = None
    for tr, w, u in geoms:
        if n % tr:
            print(f"tr={tr:5d} w={w:5d} u={u:5d}  SKIP (n % tr != 0)")
            continue
        try:
            wm = jax.jit(
                lambda idx, _tr=tr, _w=w, _u=u: wc.make_windowed(
                    idx, n, _tr, _w, _u
                )
            )(idx)
            corr_live = int(jnp.sum(wm.corr >= 0))
            ovf = int(wm.overflow)

            def step(x, _wm=wm):
                f = feats.replace(
                    data=feats.data + x[0, 0].astype(feats.dtype) * 1e-30
                )
                out = wc.windowed_conv(f, _wm, w27, _wm, out_packed=True)
                s = jnp.sum(out.data.reshape(-1)[:4].astype(jnp.float32))
                return x + s * 1e-30, s

            jstep = jax.jit(step)
            ms = measure(jstep, x0)
            out = float(np.asarray(jax.jit(lambda: step(x0)[1])()))
            if ref is None:
                ref = out
            ok = "OK" if abs(out - ref) < 1e-3 else f"MISMATCH {out} vs {ref}"
            print(
                f"tr={tr:5d} w={w:5d} u={u:5d}  {ms:7.3f} ms  "
                f"corr={corr_live} ovf={ovf}  {ok}"
            )
        except Exception as e:
            print(
                f"tr={tr:5d} w={w:5d} u={u:5d}  FAILED: "
                f"{type(e).__name__}: {str(e)[:160]}"
            )


if __name__ == "__main__":
    main()
