"""Time the SHIPPED build_hierarchy (fused derive_level_maps + gated
correction builds) end-to-end, consuming every map so nothing is DCE'd.

Counterpart to probe_hierarchy_parts.py, which stage-times the old split
derive functions (s7 == pre-fusion build_hierarchy). Run both to get the
before/after of the fused per-level map derivation (ops/sparse.py
derive_level_maps).

Usage: python scripts/probe_hier_fused.py
"""

import sys
import time

import jax
import jax.numpy as jnp

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
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import (
        build_hierarchy,
        default_capacities,
    )
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        canonicalize,
    )

    num_down = 6
    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    caps = default_capacities(131072, num_down)
    print("caps:", caps)

    def ssum(acc, arr):
        return acc + jnp.sum(arr.astype(jnp.float32) * 1e-9)

    def consume(s, h):
        for g in h.grids:
            s = ssum(s, g.keys)
        for m in h.bricks:  # per-level submanifold maps (row or windowed)
            s = consume_map(s, m)
        for m in h.down_maps:
            s = consume_map(s, m)
        for m in h.up_maps:
            s = consume_map(s, m)
        return s

    def consume_map(s, m):
        if hasattr(m, "lidx"):  # WindowedMap
            for a in (m.idx, m.lidx, m.us, m.offk, m.corr, m.corr_count):
                s = ssum(s, a)
        else:
            s = ssum(s, m)
        return s

    for win in (False, True):

        @jax.jit
        def step(feats, win=win):
            s = jnp.float32(0)
            db = canonicalize(*(arrays[:3] + (feats,) + arrays[4:]))
            s = ssum(s, db.feats)
            h = build_hierarchy(db.grid, num_down, caps, win_maps=win)
            s = consume(s, h)
            return feats + 1e-30 * s.astype(feats.dtype), s

        t = measure(step, arrays[3])
        print(f"  build_hierarchy fused, win_maps={win}: {t:7.2f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
