"""A/B the _pack_rows epilogue lowerings inside the real L0 windowed conv.

Round-4's in-kernel lane pack was a bare sublane->lane ``reshape`` - fastest,
but rejected by some Mosaic builds (BENCH_r04 rc=1). Round-5 replaced it with
an MXU tile-matrix route. This probe times the forward conv with each
epilogue on the live chip so the shipped one is chosen by measurement:

  reshape   acc.reshape(tr//pout, pout*cout) (+ lane pad)  [r4 fast path]
  loop      MXU tile GEMM + per-j where-accumulate         [r5 first cut]
  masksum   MXU tile GEMM + one static mask + sublane-split reshape + sum

Usage: timeout 900 python scripts/probe_pack_modes.py
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


def pack_reshape(acc, pout, cout, lanes):
    tr = acc.shape[0]
    po = acc.reshape(tr // pout, pout * cout)
    if lanes != pout * cout:
        po = jnp.pad(po, ((0, 0), (0, lanes - pout * cout)))
    return po


def pack_loop(acc, pout, cout, lanes):
    tr = acc.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 0)
    tm = ((li % cout == ci) & (li < pout * cout)).astype(acc.dtype)
    wide = jnp.dot(acc, tm, preferred_element_type=jnp.float32)
    a3 = wide.reshape(tr // pout, pout, lanes)
    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (tr // pout, lanes), 1) // cout
    po = jnp.zeros((tr // pout, lanes), jnp.float32)
    for j in range(pout):
        po = po + jnp.where(lane_grp == j, a3[:, j, :], 0.0)
    return po


def pack_masksum(acc, pout, cout, lanes):
    tr = acc.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 0)
    tm = ((li % cout == ci) & (li < pout * cout)).astype(acc.dtype)
    wide = jnp.dot(acc, tm, preferred_element_type=jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 0) % pout
    lg = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 1) // cout
    masked = jnp.where(ri == lg, wide, 0.0)
    return masked.reshape(tr // pout, pout, lanes).sum(axis=1)


def pack_foldgemm(acc, pout, cout, lanes):
    """Spread GEMM + mask as in masksum, but fold the pout sublanes with a
    second one-hot MXU GEMM ([tr//pout, tr] @ [tr, lanes]) instead of the
    3D sublane-split reshape + sum vector op."""
    tr = acc.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 0)
    tm = ((li % cout == ci) & (li < pout * cout)).astype(acc.dtype)
    wide = jnp.dot(acc, tm, preferred_element_type=jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 0) % pout
    lg = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 1) // cout
    masked = jnp.where(ri == lg, wide, 0.0)
    qi = jax.lax.broadcasted_iota(jnp.int32, (tr // pout, tr), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (tr // pout, tr), 1)
    fold = (rj // pout == qi).astype(jnp.float32)
    return jnp.dot(fold, masked, preferred_element_type=jnp.float32)


def pack_strided(acc, pout, cout, lanes):
    """masksum's spread GEMM, then fold via pout static strided sublane
    slices + where-adds (no 3D vector, no second GEMM)."""
    tr = acc.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 0)
    tm = ((li % cout == ci) & (li < pout * cout)).astype(acc.dtype)
    wide = jnp.dot(acc, tm, preferred_element_type=jnp.float32)
    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (tr // pout, lanes), 1) // cout
    po = jnp.zeros((tr // pout, lanes), jnp.float32)
    for j in range(pout):
        po = po + jnp.where(lane_grp == j, wide[j::pout, :], 0.0)
    return po


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
    wm = jax.jit(lambda: wc.make_windowed(idx, n, TR, 512, 2048))()

    c = 16
    feats = wc.pack_feats(jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16))
    w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.2, jnp.bfloat16)
    x0 = jnp.zeros((8, 8), jnp.float32)

    outs = {}
    for name, fn in [
        ("reshape", pack_reshape),
        ("loop", pack_loop),
        ("masksum", pack_masksum),
        ("foldgemm", pack_foldgemm),
        ("strided", pack_strided),
    ]:
        wc._pack_rows = fn  # fresh closure below -> fresh trace

        def step(x, _fn=fn):
            f = feats.replace(
                data=feats.data + x[0, 0].astype(feats.dtype) * 1e-30
            )
            out = wc._run_fwd(f, w, wm, out_packed=True)
            s = jnp.sum(out.data.reshape(-1)[:4].astype(jnp.float32))
            return x + s * 1e-30, s

        jstep = jax.jit(step)
        try:
            ms = measure(jstep, x0)
            out = np.asarray(jax.jit(lambda: step(x0)[1])())
            outs[name] = float(out)
            print(f"{name:8s} {ms:7.3f} ms  probe_sum={out:.6f}")
        except Exception as e:
            print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")
    if len(outs) > 1:
        vals = list(outs.values())
        assert max(vals) - min(vals) < 1e-3, outs
        print("outputs agree")


if __name__ == "__main__":
    main()
