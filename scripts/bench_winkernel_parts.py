"""Ablate the windowed-conv Pallas kernel to find the per-offset-step cost.

Variants (env PST_PART):
  full     - the real per-offset body (oh compare + gather GEMM + selects + W GEMM)
  dot1     - oh compare + gather GEMM only
  cmp      - oh compare only
  nodma    - full body but one DMA total (reuse buffer)
  noloop   - DMA only, no per-offset compute
Reports ms per call at L0 scale (N=131072, C=16, TR/W/U from env).
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

N = 131072
C = 16
K = 27
TR = int(os.environ.get("PST_WIN_TR", "256"))
W = int(os.environ.get("PST_WIN_W", "512"))
U = int(os.environ.get("PST_WIN_U", "2048"))
PARTS = os.environ.get("PST_PART", "maskmul,fullmask,full").split(",")
P = 128 // C
ITERS = 16


def kernel(us_ref, offk_ref, lidx_ref, w_ref, wt_ref, feats_ref, out_ref, ubuf, sems,
           *, part):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    up = U // P
    wp = W // P

    def dma(tt):
        start = pl.multiple_of(us_ref[tt] // P, 8)
        return pltpu.make_async_copy(
            feats_ref.at[pl.ds(start, up), :], ubuf.at[tt % 2], sems.at[tt % 2]
        )

    do_dma = part != "nodma"

    @pl.when(t == 0)
    def _():
        dma(0).start()

    dma(t).wait() if do_dma else None

    @pl.when(t + 1 < nt)
    def _():
        if do_dma:
            dma(t + 1).start()

    if part == "noloop":
        out_ref[:] = jnp.zeros_like(out_ref)
        return

    grps = lidx_ref[:] // P  # [TR, K] hoisted
    slots = lidx_ref[:] - grps * P
    iota = jax.lax.broadcasted_iota(jnp.int32, (TR, wp), 1)
    acc = jnp.zeros((TR, C), jnp.float32)
    for kk in range(K):
        offp = pl.multiple_of(offk_ref[t * K + kk] // P, 8)
        oh = (grps[:, kk][:, None] == iota).astype(jnp.bfloat16)
        if part == "cmp":
            acc = acc + oh[:, :C].astype(jnp.float32)
            continue
        g = jnp.dot(
            oh, ubuf[t % 2, pl.ds(offp, wp), :],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        if part == "dot1":
            acc = acc + g[:, :C].astype(jnp.float32)
            continue
        if part in ("fullmask", "maskmul"):
            # full-width lane mask: lane // C == slot  -> zero other slots,
            # then one [TR, 128] @ [128, C] GEMM against slot-tiled weights
            lane_grp = jax.lax.broadcasted_iota(jnp.int32, (TR, P * C), 1) // C
            gm = g * (lane_grp == slots[:, kk][:, None]).astype(jnp.bfloat16)
            if part == "maskmul":
                acc = acc + gm[:, :C].astype(jnp.float32)
            else:
                acc = acc + jnp.dot(
                    gm, wt_ref[kk], preferred_element_type=jnp.float32
                )
            continue
        slot = slots[:, kk]
        fsel = jnp.zeros((TR, C), jnp.bfloat16)
        for s in range(P):
            fsel = jnp.where((slot == s)[:, None], g[:, s * C:(s + 1) * C], fsel)
        acc = acc + jnp.dot(fsel, w_ref[kk], preferred_element_type=jnp.float32)
    out_ref[:] = acc


def main():
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import make_windowed
    from panopticsegforlargescalepointcloud_tpu.ops.sparse import (
        KERNEL_OFFSETS_K3, make_grid, same_level_map,
    )
    from bench import build_inputs
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays, prepare_example,
    )

    rng = np.random.default_rng(0)
    vb = build_inputs(num_tiles=4, capacity=N)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db, hier = prepare_example(arrays, 6)
    nbr = hier.bricks[0]
    wm = jax.jit(lambda: make_windowed(jnp.asarray(nbr), N, TR, W, U))()
    print(f"TR={TR} W={W} U={U} corr={int(wm.corr_count)}")

    feats = jnp.asarray(rng.normal(size=(N, C)), jnp.bfloat16)
    fp = feats.reshape(N // P, P * C)
    w27 = jnp.asarray(rng.normal(size=(K, C, C)) * 0.2, jnp.bfloat16)
    wtiled = jnp.tile(w27, (1, P, 1))  # [K, P*C, C]
    t = N // TR

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((TR, K), lambda i, us, offk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TR, C), lambda i, us, offk: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, U // P, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    x0 = jnp.asarray(rng.normal(size=(8, 16)), jnp.bfloat16)
    for part in PARTS:
        @jax.jit
        def run(x, part=part):
            f = fp + x[0, 0] * jnp.bfloat16(1e-30)
            out = pl.pallas_call(
                partial(kernel, part=part),
                out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
                grid_spec=grid_spec,
            )(wm.us, wm.offk.reshape(-1), wm.lidx, w27, wtiled, f)
            return x + (out[0, 0] * 1e-30).astype(jnp.bfloat16), jnp.sum(out[0])

        def chain(n):
            x, s = x0, None
            for _ in range(n):
                x, s = run(x)
            return float(s)

        chain(1)
        t0 = time.perf_counter(); chain(1); t1 = time.perf_counter()
        chain(ITERS + 1); t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9) / ITERS
        print(f"{part}: {dt*1e3:8.3f} ms  ({dt/ (t*K) * 1e9:6.1f} ns per (t,k))")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
