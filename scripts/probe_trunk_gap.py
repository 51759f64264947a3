"""Attribute the trunk glue gap: trunk-only depth curve + L1-module bisection.

The depth curve from profile_unet_depth.py conflates two depth-derivatives:
each added level also adds its hierarchy/windowify build (canonicalize +
build_hierarchy run INSIDE its step). This probe separates them:

  part 1  hierarchy-only depth curve: canonicalize + build_hierarchy(n_down),
          consumed by one cheap conv per level so windowify isn't DCE'd.
  part 2  trunk-only depth curve: hierarchy built once OUTSIDE the jit and
          passed in as arguments; step = UNet.apply only.
  part 3  L1-module bisection at trunk shapes: bare chains of the exact convs
          the depth=2 increment adds (L0->L1 down, L1 resblocks, L1->L0 up,
          concat + L0 decoder resblocks), each timed standalone.

Usage: python scripts/probe_trunk_gap.py [max_depth]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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


def truncated_net(plan, depth, SparseUNet):
    dch = list(plan["down_channels"][:depth])
    dst = list(plan["down_strides"][:depth])
    uch = list(plan["up_channels"][-depth:])
    ust = list(plan["up_strides"][-depth:])
    if depth < 7:
        skip_c = plan["down_channels"][depth - 1][1]
        uch[0] = (skip_c, uch[0][1])
    return SparseUNet(
        down_channels=tuple(dch), up_channels=tuple(uch),
        down_strides=tuple(dst), up_strides=tuple(ust),
        gemm_mode="loop", compute_dtype="bfloat16",
    ), sum(1 for s in dst if s == 2)


def main():
    from bench import build_inputs
    from panopticsegforlargescalepointcloud_tpu.models.plans import (
        paper_backbone_plan,
    )
    from panopticsegforlargescalepointcloud_tpu.models.unet import SparseUNet
    from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
        WindowedMap,
        windowed_conv,
    )
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        canonicalize,
    )

    max_depth = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    plan = paper_backbone_plan(4, 16)
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)

    print("== part 1: canonicalize + hierarchy depth curve ==")
    prev = 0.0
    for depth in range(1, max_depth + 1):
        n_down = depth - 1

        @jax.jit
        def hstep(feats, arrays, nd=n_down):
            db = canonicalize(*arrays)
            hh = build_hierarchy(db.grid, nd, win_maps=True)
            # consume every level's windowed map with a 1-channel conv so
            # windowify survives DCE (weights tiny; conv cost ~0)
            s = jnp.float32(0)
            f = feats[:, :1].astype(jnp.bfloat16)
            w1 = jnp.ones((27, 1, 1), jnp.bfloat16)

            def consume(m, cap_in):
                if not isinstance(m, WindowedMap):
                    return jnp.float32(0)
                fl = f[:cap_in]
                return jnp.sum(windowed_conv(fl, m, w1)[:8])

            # touch EVERY windowed map (submanifold + strided) so no
            # make_windowed call is DCE'd
            for lv in range(nd + 1):
                s = s + consume(hh.bricks[lv], hh.grids[lv].capacity)
            for lv in range(nd):
                s = s + consume(hh.down_maps[lv], hh.grids[lv].capacity)
                s = s + consume(hh.up_maps[lv], hh.grids[lv + 1].capacity)
            return feats + 1e-30 * s.astype(feats.dtype), s

        t = measure(lambda x: hstep(x, arrays), arrays[3])
        print(f"  n_down={n_down}: {t:7.2f} ms  (+{t - prev:6.2f})")
        prev = t
        sys.stdout.flush()

    print("== part 2: trunk-only depth curve (hierarchy passed in) ==")
    db = jax.jit(canonicalize)(*arrays)
    prev = 0.0
    for depth in range(1, max_depth + 1):
        net, n_down = truncated_net(plan, depth, SparseUNet)
        h = jax.jit(lambda g, nd=n_down: build_hierarchy(g, nd, win_maps=True))(
            db.grid
        )
        var = jax.jit(lambda r, f, hh: net.init(r, f, hh, False, 0.1))(
            rng, db.feats, h
        )

        @jax.jit
        def step(feats, h):
            x = net.apply(var, feats, h, False, 0.1)
            s = jnp.sum(x)
            return feats + 1e-30 * s.astype(feats.dtype), s

        t = measure(lambda x: step(x, h), db.feats)
        print(f"  depth={depth} (n_down={n_down}): {t:7.2f} ms  (+{t - prev:6.2f})")
        prev = t
        sys.stdout.flush()

    print("== part 3: depth=2 increment bisection (bare op chains) ==")
    h = jax.jit(lambda g: build_hierarchy(g, 1, win_maps=True))(db.grid)
    n0, n1 = h.grids[0].capacity, h.grids[1].capacity
    reps = 6

    def timed_chain(label, fn, x0):
        @jax.jit
        def step(x):
            s = fn(x)
            return x + 1e-30 * s.astype(x.dtype), s

        t = measure(step, x0)
        print(f"  {label}: {t:7.2f} ms ({t / reps:5.2f}/op)")
        sys.stdout.flush()

    # exact maps the depth-2 increment uses; down/up maps are mutual
    # transposes (ops/conv.py convention)
    down_m, down_t = h.down_maps[0], h.up_maps[0]
    up_m, up_t = h.up_maps[0], h.down_maps[0]
    sub1 = h.bricks[1]
    w_dn = jnp.asarray(nprng.normal(size=(27, 16, 32)), jnp.bfloat16)
    w_s1 = jnp.asarray(nprng.normal(size=(27, 32, 32)), jnp.bfloat16)
    w_up = jnp.asarray(nprng.normal(size=(27, 32, 16)), jnp.bfloat16)
    x0 = jnp.asarray(nprng.normal(size=(n0, 16)), jnp.bfloat16)
    x1 = jnp.asarray(nprng.normal(size=(n1, 32)), jnp.bfloat16)

    def conv_any(f, m, mt, w):
        if isinstance(m, WindowedMap):
            tm = mt if isinstance(mt, WindowedMap) else None
            return windowed_conv(f, m, w, tm)
        from panopticsegforlargescalepointcloud_tpu.ops.conv import sparse_conv

        idx = m.idx if isinstance(m, WindowedMap) else m
        return sparse_conv(f, idx, w, mode="loop", out_dtype=jnp.float32)

    timed_chain(
        f"down conv x{reps} (L0->L1, {type(down_m).__name__})",
        lambda x: sum(
            jnp.sum(conv_any(x, down_m, down_t, w_dn)[:8]) for _ in range(reps)
        ),
        x0,
    )
    timed_chain(
        f"submanifold L1 x{reps} ({type(sub1).__name__})",
        lambda x: sum(
            jnp.sum(conv_any(x, sub1, sub1, w_s1)[:8]) for _ in range(reps)
        ),
        x1,
    )
    timed_chain(
        f"up conv x{reps} (L1->L0, {type(up_m).__name__})",
        lambda x: sum(
            jnp.sum(conv_any(x, up_m, up_t, w_up)[:8]) for _ in range(reps)
        ),
        x1,
    )

    # chained (output feeds input) instead of independent repeats
    def chain_sub(x):
        f = x
        for _ in range(reps):
            f = conv_any(f, sub1, sub1, w_s1).astype(jnp.bfloat16)
        return jnp.sum(f[:8])

    timed_chain(f"submanifold L1 CHAINED x{reps}", chain_sub, x1)

    # f32 boundaries + mask/affine between convs (the module's real glue)
    mask1 = h.grids[1].mask
    sc = jnp.asarray(nprng.normal(size=(32,)), jnp.float32)

    def chain_glued(x):
        f = x.astype(jnp.float32)
        for _ in range(reps):
            o = conv_any(f.astype(jnp.bfloat16), sub1, sub1, w_s1)
            o = jnp.where(mask1[:, None], o * sc + 0.1, 0.0)
            f = jax.nn.relu(o)
        return jnp.sum(f[:8])

    timed_chain(f"submanifold L1 CHAINED+glue x{reps}", chain_glued, x1)


if __name__ == "__main__":
    main()
