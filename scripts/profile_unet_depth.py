"""Bisect the UNet trunk wall by depth: time truncated UNets (top k levels)
at bench shapes. The per-conv winconv microbenches reconstruct ~83-97 ms of
kernels but the in-situ trunk is ~230 ms (scripts/bench_glue.py,
/tmp probes r3) - the depth curve shows whether the excess is spread evenly
(per-conv/per-pallas-call overhead) or concentrated at particular levels
(layout conversions, small-level row paths, skip concats).

Usage: python scripts/profile_unet_depth.py [max_depth]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

ITERS = 6


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
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS * 1e3


def main():
    from bench import build_inputs
    from panopticsegforlargescalepointcloud_tpu.models.plans import (
        paper_backbone_plan,
    )
    from panopticsegforlargescalepointcloud_tpu.models.unet import SparseUNet
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        canonicalize,
    )

    max_depth = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    plan = paper_backbone_plan(4, 16)
    rng = jax.random.PRNGKey(0)

    prev = 0.0
    for depth in range(1, max_depth + 1):
        # truncated plan: first `depth` down modules, last `depth` up modules,
        # with the up entry that consumes the bottom level adjusted to take
        # the (un-concatenated) bottom output
        dch = list(plan["down_channels"][:depth])
        dst = list(plan["down_strides"][:depth])
        uch = list(plan["up_channels"][-depth:])
        ust = list(plan["up_strides"][-depth:])
        if depth < 7:
            # first kept up module normally receives cat(skip, x); truncated
            # it receives only x from the new bottom level
            skip_c = plan["down_channels"][depth - 1][1]
            uch[0] = (skip_c, uch[0][1])
        net = SparseUNet(
            down_channels=tuple(dch), up_channels=tuple(uch),
            down_strides=tuple(dst), up_strides=tuple(ust),
            gemm_mode="loop", compute_dtype="bfloat16",
        )
        n_down = sum(1 for s in dst if s == 2)

        # init once outside timing
        db = jax.jit(canonicalize)(*arrays)
        h = jax.jit(lambda g, nd=n_down: build_hierarchy(g, nd, win_maps=True))(
            db.grid
        )
        # jit the init: eager init on the axon backend compiles one remote
        # primitive at a time (CLAUDE.md pitfall) and takes tens of minutes
        var = jax.jit(lambda r, f, hh: net.init(r, f, hh, False, 0.1))(
            rng, db.feats, h
        )

        @jax.jit
        def step(feats, arrays):
            db = canonicalize(*arrays)
            db = db._replace(feats=feats)
            hh = build_hierarchy(db.grid, n_down, win_maps=True)
            x = net.apply(var, db.feats, hh, False, 0.1)
            s = jnp.sum(x)
            return feats + 1e-30 * s.astype(feats.dtype), s

        t = measure(lambda x: step(x, arrays), arrays[3])
        print(f"depth={depth} (n_down={n_down}): {t:7.2f} ms  (+{t - prev:6.2f})")
        prev = t
        sys.stdout.flush()


if __name__ == "__main__":
    main()
