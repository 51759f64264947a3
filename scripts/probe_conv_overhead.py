"""Attribute the per-conv cost of the windowed L0 conv (the trunk's unit).

PLAN.md r4: backbone+heads is ~90 ms at the 131k-voxel batch and the L0-size
convs dominate; per-kernel microbenches reconstruct to well under the chained
per-conv cost. This probe times, on the REAL L0 submanifold map, each layer
of wrapping a trunk conv accrues - all chained 8x inside ONE jit so per-call
dispatch is amortized and only per-OP cost remains:

  kernel      bare _run_fwd, packed in/out (the Pallas call alone)
  +corr       + _corr_apply (the unconditional exact correction pass)
  windowed    full windowed_conv (custom_vjp wrapper, eval path)
  +bnrelu     windowed + packed-layout affine+relu (ConvBNReLU eval body)

Timing: bench.py protocol (chained data dependency, 1 vs N+1 differencing).
Usage: timeout 900 python scripts/probe_conv_overhead.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

ITERS = 16
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
        Packed,
        _corr_apply,
        _run_fwd,
        make_windowed,
        pack_feats,
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

    b0 = hier.bricks[0]
    idx = jnp.asarray(b0.idx if hasattr(b0, "idx") else b0)
    n = idx.shape[0]
    wm = jax.jit(lambda: make_windowed(idx, n, TR, 512, 2048))()
    print(f"L0: n={n} overflow={int(wm.overflow)} corr_live="
          f"{int(jnp.sum(wm.corr >= 0))}")

    for c in (16, 32):
        feats = pack_feats(
            jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
        )
        w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.2, jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        x0 = jnp.zeros((8, 8), jnp.float32)

        def seed(x):
            return feats.replace(
                data=feats.data + x[0, 0].astype(feats.dtype) * 1e-30
            )

        def chain(out, x):
            d = out.data if isinstance(out, Packed) else out
            s = jnp.sum(d.reshape(-1)[:4].astype(jnp.float32))
            return x + s * 1e-30, s

        @jax.jit
        def t_kernel(x):
            return chain(_run_fwd(seed(x), w, wm, out_packed=True), x)

        @jax.jit
        def t_corr(x):
            f = seed(x)
            return chain(_corr_apply(f, w, wm, _run_fwd(f, w, wm, True)), x)

        @jax.jit
        def t_win(x):
            return chain(windowed_conv(seed(x), wm, w, wm, out_packed=True), x)

        @jax.jit
        def t_bnrelu(x):
            h = windowed_conv(seed(x), wm, w, wm, out_packed=True)
            p = h.p
            lanes = h.data.shape[1]
            tile = jnp.tile(scale, p)
            tileb = jnp.tile(bias, p)
            if lanes != p * c:
                tile = jnp.pad(tile, (0, lanes - p * c))
                tileb = jnp.pad(tileb, (0, lanes - p * c))
            y = jnp.maximum(h.data * tile + tileb, 0.0)
            return chain(h.replace(data=y), x)

        rows = [
            ("kernel", t_kernel),
            ("+corr", t_corr),
            ("windowed", t_win),
            ("+bnrelu", t_bnrelu),
        ]
        for name, f in rows:
            print(f"C={c:3d} {name:9s} {measure(f, x0):7.3f} ms")


if __name__ == "__main__":
    main()
