"""How much of the in-situ backbone wall is NOT the conv kernels?

profile_levels.py win-mode reconstructs ~83 ms of windowed-conv kernels, but
the in-situ backbone+heads phase is ~254 ms (profile_backbone_win.py minus
hierarchy) - this bench isolates the glue: chained (winconv -> masked BN
eval -> ReLU) blocks vs bare winconv chains at L0/L1 shapes, plus the cost
of one BN+ReLU pass alone at L0 width. If the delta is ~[0.3-0.5] ms per
block x ~50 blocks, the (8,128) padding tax on C=16/32 elementwise passes
explains the gap and motivates keeping activations lane-packed (or fusing
the BN affine into the kernel epilogue).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = 8
DEPTH = 8


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
    from bench import build_inputs
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import windowed_conv
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        canonicalize,
    )

    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db = jax.jit(canonicalize)(*arrays)
    hier = jax.jit(lambda g: build_hierarchy(g, 6, win_maps=True))(db.grid)
    rng = np.random.default_rng(0)

    for lvl, c in ((0, 16), (1, 32)):
        n = hier.grids[lvl].capacity
        mask = hier.grids[lvl].mask
        wmap = hier.bricks[lvl]
        w = jnp.asarray(rng.normal(size=(27, c, c)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
        scale = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

        @jax.jit
        def bare(x):
            h = x
            for _ in range(DEPTH):
                h = windowed_conv(h.astype(jnp.bfloat16), wmap,
                                  w.astype(jnp.bfloat16))
            s = jnp.sum(h[0])
            return x + 1e-30 * s.astype(x.dtype), s

        @jax.jit
        def glued(x):
            h = x
            for _ in range(DEPTH):
                h = windowed_conv(h.astype(jnp.bfloat16), wmap,
                                  w.astype(jnp.bfloat16))
                # eval-mode BN = per-channel affine on masked rows + ReLU
                h = jnp.where(mask[:, None], h * scale + bias, 0.0)
                h = jax.nn.relu(h)
            s = jnp.sum(h[0])
            return x + 1e-30 * s.astype(x.dtype), s

        t_bare = measure(bare, x0)
        t_glue = measure(glued, x0)
        per = (t_glue - t_bare) / DEPTH * 1e3
        print(f"L{lvl} C={c:3d} N={n}: bare {t_bare/DEPTH*1e3:6.2f} ms/conv, "
              f"+BN/ReLU {t_glue/DEPTH*1e3:6.2f} ms/conv "
              f"(glue {per:+.2f} ms per block)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
