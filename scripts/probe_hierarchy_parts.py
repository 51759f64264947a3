"""Attribute the hierarchy+windowify build cost stage by stage.

probe_trunk_gap.py showed the full forward ledger is ~235 ms hierarchy build
+ ~80 ms trunk (not the "trunk glue" suspected in r3) - the phase bench's
61 ms hierarchy reading was partially DCE'd. This probe times a CUMULATIVE
stage curve of the real build (same functions / caps / window params as
ops/hierarchy.build_hierarchy, mirrored here so stages can stop early);
every stage's outputs are consumed by a scalar sum so nothing is DCE'd.

Stages:
  s0 canonicalize
  s1 + downsample chain (6 levels) + slot tables
  s2 + same maps (top sort-join + derive chain)
  s3 + down maps (derived)
  s4 + up maps (transposed)
  s5 + windowify submanifold maps
  s6 + windowify down maps
  s7 + windowify up maps       (== build_hierarchy(win_maps=True))

Usage: python scripts/probe_hierarchy_parts.py
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
        _WIN_DOWN,
        _WIN_SUBM,
        _WIN_TR,
        _WIN_UP,
        default_capacities,
    )
    from panopticsegforlargescalepointcloud_tpu.ops.sparse import (
        KERNEL_OFFSETS_K3,
        derive_down_map,
        derive_same_map,
        downsample,
        same_level_map,
        slot_table_from_parent,
        up_map_from_down,
    )
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
        make_windowed,
        supports_windowing,
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

    def build(stage, feats, arrays):
        s = jnp.float32(0)
        db = canonicalize(*arrays)
        s = ssum(s, db.grid.keys)
        s = ssum(s, db.feats)
        if stage == 0:
            return s
        grids = [db.grid]
        parents, slots = [], []
        fine = db.grid
        for lv in range(num_down):
            coarse, parent = downsample(fine, caps[lv + 1])
            parents.append(parent)
            slots.append(slot_table_from_parent(fine, parent, caps[lv + 1]))
            grids.append(coarse)
            fine = coarse
            s = ssum(s, coarse.keys)
            s = ssum(s, parent)
            s = ssum(s, slots[-1])
        if stage == 1:
            return s
        same = [None] * (num_down + 1)
        same[num_down] = same_level_map(grids[num_down], KERNEL_OFFSETS_K3)
        for lv in range(num_down - 1, -1, -1):
            same[lv] = derive_same_map(grids[lv], parents[lv], slots[lv], same[lv + 1])
        for m in same:
            s = ssum(s, m)
        if stage == 2:
            return s
        down = [derive_down_map(same[lv + 1], slots[lv]) for lv in range(num_down)]
        for m in down:
            s = ssum(s, m)
        if stage == 3:
            return s
        up = [up_map_from_down(down[lv], caps[lv]) for lv in range(num_down)]
        for m in up:
            s = ssum(s, m)
        if stage == 4:
            return s

        def winsum(s, maps, n_ins, w, u):
            for m, n_in in zip(maps, n_ins):
                if supports_windowing(m.shape[0], n_in, _WIN_TR, u):
                    wm = make_windowed(m, n_in, _WIN_TR, w, u)
                    for a in (wm.lidx, wm.us, wm.offk, wm.corr, wm.corr_count):
                        s = ssum(s, a)
            return s

        s = winsum(s, same, [caps[lv] for lv in range(num_down + 1)], *_WIN_SUBM)
        if stage == 5:
            return s
        s = winsum(s, down, [caps[lv] for lv in range(num_down)], *_WIN_DOWN)
        if stage == 6:
            return s
        s = winsum(s, up, [caps[lv + 1] for lv in range(num_down)], *_WIN_UP)
        return s

    names = [
        "s0 canonicalize",
        "s1 +downsample+slots",
        "s2 +same maps (derive)",
        "s3 +down maps",
        "s4 +up maps",
        "s5 +win subm",
        "s6 +win down",
        "s7 +win up",
    ]
    prev = 0.0
    for stage in range(8):

        @jax.jit
        def step(feats, stage=stage):
            s = build(stage, feats, arrays[:3] + (feats,) + arrays[4:])
            return feats + 1e-30 * s.astype(feats.dtype), s

        t = measure(step, arrays[3])
        print(f"  {names[stage]}: {t:7.2f} ms  (+{t - prev:6.2f})")
        prev = t
        sys.stdout.flush()


if __name__ == "__main__":
    main()
