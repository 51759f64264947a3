"""Micro-attribute the kernel-map derive + windowify cost at L0/L1 scale.

probe_hierarchy_parts.py localized the forward's dominant cost to the map
build: same-map derive chain +65 ms, down maps +32 ms, up maps +21 ms,
windowify(subm) +44 ms (131k-voxel batch). This probe times the internal
passes of derive_same_map / derive_down_map / up_map_from_down /
make_windowed on the real L0/L1 shapes so the fix targets the right pass
(suspects: the flat element-gather `take(flat, idx)` on [N,27], the 8-way
parity permute, and make_windowed's 3.5M-element cumsum).

Usage: python scripts/probe_derive_parts.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

ITERS = 8


def measure(fn, *args):
    """Chained-dependency timing (axon block_until_ready unreliable)."""
    jfn = jax.jit(fn)

    def chain(n):
        s = jnp.float32(0)
        for _ in range(n):
            s = s + jfn(*args, s)
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
        _WIN_SUBM,
        _WIN_TR,
        default_capacities,
    )
    from panopticsegforlargescalepointcloud_tpu.ops.sparse import (
        KERNEL_OFFSETS_K3,
        _SAME_KOFF,
        _parity_permute,
        derive_down_map,
        derive_same_map,
        downsample,
        same_level_map,
        slot_table_from_parent,
        up_map_from_down,
    )
    from panopticsegforlargescalepointcloud_tpu.ops.winconv import make_windowed
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        canonicalize,
    )

    vb = build_inputs(num_tiles=4, capacity=131072)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    caps = default_capacities(131072, 2)
    db = jax.jit(lambda a: canonicalize(*a))(arrays)
    fine = db.grid
    coarse, parent = jax.jit(downsample, static_argnums=1)(fine, caps[1])
    slots = jax.jit(slot_table_from_parent, static_argnums=2)(fine, parent, caps[1])
    cmap = jax.jit(same_level_map)(coarse, KERNEL_OFFSETS_K3)
    n = fine.capacity

    # precompute derive inputs for part-wise timing
    def parts_inputs():
        par_bits = (fine.coords & 1).astype(jnp.int32)
        parity = par_bits[:, 0] * 4 + par_bits[:, 1] * 2 + par_bits[:, 2]
        pnbr = jnp.take(cmap, jnp.maximum(parent, 0), axis=0)
        nbr_brick = _parity_permute(pnbr, parity, _SAME_KOFF)
        from panopticsegforlargescalepointcloud_tpu.ops.sparse import _SAME_SLOT
        slot = jnp.take(jnp.asarray(_SAME_SLOT), parity, axis=0)
        idx = jnp.where(nbr_brick >= 0, nbr_brick * 8 + slot, slots.size - 1)
        return parity, pnbr, nbr_brick, idx

    parity, pnbr, nbr_brick, idx = jax.jit(parts_inputs)()
    fmap = jax.jit(derive_same_map)(fine, parent, slots, cmap)

    def t(name, fn, *args):
        ms = measure(fn, *args)
        print(f"  {name}: {ms:7.2f} ms")
        sys.stdout.flush()

    print(f"== derive_same_map parts (L0: N={n}, Nc={caps[1]}) ==")
    t("row-gather pnbr = cmap[parent]",
      lambda p, s: jnp.sum(jnp.take(cmap, jnp.maximum(p, 0), axis=0)).astype(jnp.float32) * 1e-9 + s,
      parent)
    t("parity permute (8 perms + selects)",
      lambda pn, pa, s: jnp.sum(_parity_permute(pn, pa, _SAME_KOFF)).astype(jnp.float32) * 1e-9 + s,
      pnbr, parity)
    t("flat element-gather slot_table[idx]",
      lambda ix, s: jnp.sum(jnp.take(slots.reshape(-1), ix)).astype(jnp.float32) * 1e-9 + s,
      idx)
    t("derive_same_map (whole)",
      lambda p, sl, s: jnp.sum(derive_same_map(fine, p, sl, cmap)).astype(jnp.float32) * 1e-9 + s,
      parent, slots)
    t("derive_down_map (whole)",
      lambda sl, s: jnp.sum(derive_down_map(cmap, sl)).astype(jnp.float32) * 1e-9 + s,
      slots)
    t("up_map_from_down (scatter)",
      lambda dm, s: jnp.sum(up_map_from_down(dm, n)).astype(jnp.float32) * 1e-9 + s,
      jax.jit(derive_down_map)(cmap, slots))

    w, u = _WIN_SUBM
    print(f"== make_windowed parts (L0 map [N={n}, 27], w={w} u={u}) ==")

    def win_mins(m, s):
        tiles = m.reshape(n // _WIN_TR, _WIN_TR, 27)
        mn = jnp.min(jnp.where(tiles >= 0, tiles, jnp.int32(n)), axis=1)
        return jnp.sum(mn).astype(jnp.float32) * 1e-9 + s

    def win_lidx(m, s):
        tiles = m.reshape(n // _WIN_TR, _WIN_TR, 27)
        mn = jnp.min(jnp.where(tiles >= 0, tiles, jnp.int32(n)), axis=1)
        ws = jnp.minimum(mn, max(n - w, 0))
        ws = (ws // 64) * 64
        us = jnp.min(ws, axis=1)
        us = jnp.minimum(us, max(n - u, 0))
        offk = jnp.clip(ws - us[:, None], 0, u - w)
        eff = us[:, None] + offk
        lidx = m - jnp.repeat(eff, _WIN_TR, axis=0)
        in_win = (m >= 0) & (lidx >= 0) & (lidx < w)
        return jnp.sum(jnp.where(in_win, lidx, -1)).astype(jnp.float32) * 1e-9 + s

    def win_corr(m, s):
        flag = (m < -1).reshape(-1)  # same shape/ops as the real flag
        cpos = jnp.cumsum(flag.astype(jnp.int32)) - 1
        tgt = jnp.where(flag & (cpos < 1024), cpos, 1024)
        corr = jnp.full((1025,), -1, jnp.int32).at[tgt].set(
            jnp.arange(m.size, dtype=jnp.int32), mode="drop")[:1024]
        return jnp.sum(corr).astype(jnp.float32) * 1e-9 + s

    t("tile mins [t,27]", win_mins, fmap)
    t("mins + lidx/in_win", win_lidx, fmap)
    t("corr cumsum+scatter (3.5M)", win_corr, fmap)
    t("make_windowed (whole)",
      lambda m, s: (lambda wm: (jnp.sum(wm.lidx) + jnp.sum(wm.us) + jnp.sum(wm.offk)
                                + jnp.sum(wm.corr) + wm.corr_count).astype(jnp.float32) * 1e-9 + s)(
          make_windowed(m, n, _WIN_TR, w, u)),
      fmap)


if __name__ == "__main__":
    main()
