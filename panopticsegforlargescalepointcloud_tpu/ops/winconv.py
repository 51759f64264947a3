"""Windowed-streaming sparse convolution: the Pallas TPU kernel.

Replaces per-row kernel-map gathers (``ops/conv.py``) for large levels. The
key structural fact (CLAUDE.md invariant): SparseGrid rows are key-sorted, and
a kernel map column k targets ``key + const_k`` - a monotone transform - so
``idx[:, k]`` is NON-DECREASING over valid rows. For a tile of TR consecutive
output rows, the column-k neighbors therefore live in a contiguous input-row
WINDOW of roughly TR rows - and the 27 per-offset windows of one tile overlap
heavily (they all track the same spatial region, shifted by at most a couple
of grid planes). The kernel exploits both facts:

* ONE union-window DMA per tile (not per offset: per-DMA latency dominated a
  27-DMA/tile variant - 14k small DMAs cost more than the row gathers they
  replaced), double-buffered across grid steps so the next tile's stream
  overlaps this tile's compute;
* per-offset views are VMEM slices of the union buffer; rows are selected by
  a one-hot matmul on the MXU (TPUs have no VMEM gather), the voxel inside
  the lane-packed row by P static masked selects, and the kernel-offset
  weights then apply as a small [C, Cout] GEMM;
* the f32 accumulator lives in VMEM across all 27 offsets - the XLA
  formulation pays ~2x its gather bytes in accumulator HBM traffic alone
  (scripts/bench_gather_width.py).

Lane packing: a [N, C] bf16 activation is stored (8,128)-tile-padded in HBM,
so row gathers and row DMAs at C=16 move 8x junk (CLAUDE.md). The kernel
instead reads the activation reshaped [N/P, P*C] with P = 128//C voxels per
fully-lane-packed row, so the union stream carries no padding waste.

Out-of-window entries (union buffer too small for a pathological tile; rare
by construction) are EXACTLY repaired by a small XLA correction pass over a
packed [corr_cap] entry list; entries beyond the cap are counted in
``overflow`` - the conv is exact whenever ``overflow == 0``, which tests
assert and metrics surface.

Reference behavior matched: MinkowskiEngine gather-GEMM-scatter convolution
(``/root/reference/torch_points3d/modules/MinkowskiEngine/api_modules.py:
235-311``); backward runs through the TRANSPOSE kernel map exactly like
ops/conv.py (submanifold maps are self-transpose, down/up maps are partners).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# window starts are aligned to 64 = 8 sublanes x the max packing factor, so
# packed-row starts/offsets (ws // P) are provable multiples of the (8, 128)
# sublane tiling for any P in {1, 2, 4, 8} (Mosaic requires it)
_ALIGN = 64


@flax.struct.dataclass
class WindowedMap:
    """A kernel map plus per-tile window metadata for the streaming kernel.

    Attributes:
      idx: [N_out, K] int32 input-row per (output row, offset); -1 absent.
      lidx: [N_out, K] int32 index local to this row's tile+offset window;
        -1 absent OR out-of-window.
      us: [T] int32 union-window start per tile (64-aligned, + u <= n_in).
      offk: [T, K] int32 per-offset window offset inside the union buffer
        (64-aligned, + w <= u).
      corr: [corr_cap] int32 flat entry ids (i * K + k) needing the XLA
        correction pass; -1 padding.
      corr_count: [] int32 number of live correction entries.
      overflow: [] int32 correction entries beyond corr_cap (conv inexact
        iff > 0; surfaced like the capacity overflow counters).
      n_in / tr / w / u: static geometry (input rows, tile rows, per-offset
        window rows, union window rows).
    """

    idx: jnp.ndarray
    lidx: jnp.ndarray
    us: jnp.ndarray
    offk: jnp.ndarray
    corr: jnp.ndarray
    corr_count: jnp.ndarray
    overflow: jnp.ndarray
    n_in: int = flax.struct.field(pytree_node=False)
    tr: int = flax.struct.field(pytree_node=False)
    w: int = flax.struct.field(pytree_node=False)
    u: int = flax.struct.field(pytree_node=False)

    @property
    def k(self) -> int:
        return self.idx.shape[1]

    @property
    def n_out(self) -> int:
        return self.idx.shape[0]


def supports_windowing(
    n_out: int, n_in: int, tr: int = 256, u: int = 2048
) -> bool:
    """Static predicate: shapes the kernel can run (callers fall back to the
    row-gather conv otherwise - tiny top levels are cheaper there anyway)."""
    return n_out % tr == 0 and n_in >= u and n_in % _ALIGN == 0


@flax.struct.dataclass
class Packed:
    """Lane-packed activations: ``data[i, s*c:(s+1)*c] == x[i*p + s, :]``.

    The logical [n, c] tensor at c < 128 pays an (8, 128) tile-padding tax in
    HBM (8x junk bytes at c=16); the packed layout stores p = 128//c voxels
    per fully-utilized 128-lane row. ``data`` is ``[n // p, lanes]`` with
    ``lanes = _lanes_pad(p, c)`` (pad lanes, if any, are zero). Keeping
    activations packed BETWEEN convs removes the padded-f32 write + repack
    read per conv that dominated the trunk wall (PLAN.md round 4: chained
    conv ~1.44 ms vs ~0.3 ms kernel time).
    """

    data: jnp.ndarray
    n: int = flax.struct.field(pytree_node=False)
    c: int = flax.struct.field(pytree_node=False)

    @property
    def p(self) -> int:
        return self.n // self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dt) -> "Packed":
        return self.replace(data=self.data.astype(dt))

    def __add__(self, other: "Packed") -> "Packed":
        assert isinstance(other, Packed) and (self.n, self.c) == (other.n, other.c)
        return self.replace(data=self.data + other.data)


def pack_feats(x: jnp.ndarray) -> "Packed | jnp.ndarray":
    """[n, c] -> Packed (identity when the pack factor is 1: c >= 128 rows
    already fill the lane tile, so the packed repr is the plain array)."""
    if isinstance(x, Packed):
        return x
    n, c = x.shape
    p = _pack_factor(c)
    if p == 1 or n % p:
        return x
    return Packed(data=_pack(x, p), n=n, c=c)


def unpack_feats(x: "Packed | jnp.ndarray") -> jnp.ndarray:
    if not isinstance(x, Packed):
        return x
    p = x.p
    return x.data[:, : p * x.c].reshape(x.n, x.c)


def feat_width(x: "Packed | jnp.ndarray") -> int:
    return x.c if isinstance(x, Packed) else x.shape[-1]


def make_windowed(
    idx: jnp.ndarray,
    n_in: int,
    tr: int = 256,
    w: int = 512,
    u: int = 2048,
    corr_cap: int = 1024,
) -> WindowedMap:
    """Build window metadata for a monotone kernel map (one XLA pass).

    ``w`` bounds one offset's window (~tr + local density fluctuation);
    ``u`` bounds the union of all K windows of a tile (w + the cross-offset
    shift, ~2 grid planes of rows for submanifold maps). Entries that fall
    outside land on the exact correction list.
    """
    n_out, k = idx.shape
    assert w % _ALIGN == 0 and u % _ALIGN == 0 and w <= u, (w, u)
    assert supports_windowing(n_out, n_in, tr, u), (n_out, n_in, tr, u)
    t = n_out // tr
    tiles = idx.reshape(t, tr, k)
    valid_t = tiles >= 0
    mn = jnp.min(jnp.where(valid_t, tiles, jnp.int32(n_in)), axis=1)  # [t, k]
    ws = jnp.minimum(mn, max(n_in - w, 0))
    ws = (ws // _ALIGN) * _ALIGN
    us = jnp.min(ws, axis=1)  # [t], already 64-aligned
    us = jnp.minimum(us, max(n_in - u, 0))
    offk = jnp.clip(ws - us[:, None], 0, u - w)
    eff = us[:, None] + offk  # effective per-offset window start
    lidx = idx - jnp.repeat(eff, tr, axis=0)
    valid = idx >= 0
    in_win = valid & (lidx >= 0) & (lidx < w)
    lidx = jnp.where(in_win, lidx, -1)

    flag = (valid & ~in_win).reshape(-1)
    count = jnp.sum(flag.astype(jnp.int32))

    # The correction list is ~always empty (windows are sized so real maps
    # fit; tests force misses to cover the repair path). Its exact build is
    # a 3.5M-element cumsum + scatter at L0 (~15 ms measured, vs ~0 for the
    # rest of make_windowed - scripts/probe_derive_parts.py), so gate it
    # behind real TPU control flow: lax.cond only executes the taken branch,
    # and the common count==0 case pays one reduction.
    def _build_corr(_):
        cpos = jnp.cumsum(flag.astype(jnp.int32)) - 1
        tgt = jnp.where(flag & (cpos < corr_cap), cpos, corr_cap)
        return jnp.full((corr_cap + 1,), -1, jnp.int32).at[tgt].set(
            jnp.arange(n_out * k, dtype=jnp.int32), mode="drop"
        )[:corr_cap]

    corr = jax.lax.cond(
        count > 0, _build_corr, lambda _: jnp.full((corr_cap,), -1, jnp.int32), None
    )
    overflow = jnp.maximum(count - corr_cap, 0)
    return WindowedMap(
        idx=idx, lidx=lidx, us=us, offk=offk, corr=corr,
        corr_count=jnp.minimum(count, corr_cap), overflow=overflow,
        n_in=n_in, tr=tr, w=w, u=u,
    )


def _pack_factor(c: int) -> int:
    p = max(1, 128 // c)
    while _ALIGN % p:
        p -= 1
    return min(p, 8)


def _pack_rows(acc, pout: int, cout: int, lanes: int):
    """In-kernel lane pack [tr, cout] -> [tr // pout, lanes] WITHOUT a
    sublane->lane shape cast: Mosaic's infer-vector-layout rejects
    ``tpu.reshape (256,16)->(32,128)``-style casts on some libtpu builds
    (the round-4 driver bench died on exactly that op), so the lane movement
    is routed through the MXU instead.

    1. ``wide = acc @ T`` tiles the cout block across the pout lane slots
       (T[c, j*cout+c] = 1): one tiny [tr, cout] x [cout, lanes] GEMM.
    2. row r owns lane group r % pout: ONE static [tr, lanes] mask kills
       every other group (pad lanes are already zero from the tile matrix).
    3. ``masked.reshape(tr//pout, pout, lanes).sum(1)`` folds the pout
       sublanes of each packed row - a SUBLANE-split cast (lane dim stays
       native 128-wide, supported everywhere) + a sublane reduction; exactly
       one live term per output element, so the fold is exact.
    """
    tr = acc.shape[0]
    li = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 0)
    tm = ((li % cout == ci) & (li < pout * cout)).astype(acc.dtype)
    wide = jnp.dot(acc, tm, preferred_element_type=jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 0) % pout
    lg = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 1) // cout
    masked = jnp.where(ri == lg, wide, 0.0)
    return masked.reshape(tr // pout, pout, lanes).sum(axis=1)


def _unpack_rows(gp, pg: int, cout: int, tr: int):
    """In-kernel lane unpack [tr // pg, lanes] -> [tr, cout]: the inverse of
    :func:`_pack_rows`, again avoiding the lane->sublane shape cast. Each
    packed row is broadcast over its pg sublanes (native-lane reshape),
    masked down to the lane slot owned by that sublane, and the slots are
    folded back to cout lanes with one [tr, lanes] x [lanes, cout] GEMM -
    exactly one live term per output element, so the fold is exact."""
    lanes = gp.shape[1]
    w2 = jnp.broadcast_to(gp[:, None, :], (tr // pg, pg, lanes)).reshape(tr, lanes)
    rmod = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 0) % pg
    li = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 1)
    w2 = jnp.where(rmod == li // cout, w2, 0.0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (lanes, cout), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (lanes, cout), 1)
    um = ((lj % cout == cj) & (lj < pg * cout)).astype(w2.dtype)
    return jnp.dot(w2, um, preferred_element_type=jnp.float32)


def _gather_masked(lidx_k, ubuf, slot_buf, offp, wp, p, c, tr):
    """One offset's row gather from the union buffer: one-hot matmul over the
    [wp, p*c] window view, then a full-width lane mask zeroing every slot
    block except the target voxel's -> [tr, p*c] bf16 with exactly one live
    C-block per row.

    The mask replaces narrow per-slot selects + a [tr, c] @ [c, cout] GEMM:
    16-lane ops and K-dim-16 matmuls ran ~8x slower than one full-width
    compare/multiply + a K-dim-128 GEMM against slot-tiled weights
    (scripts/bench_winkernel_parts.py: 15.4 -> 1.9 ms at L0 scale)."""
    grp = lidx_k // p  # -1 -> -1: matches no iota column -> zero row
    win = ubuf[slot_buf, pl.ds(offp, wp), :]
    oh = (
        grp[:, None] == jax.lax.broadcasted_iota(jnp.int32, (tr, wp), 1)
    ).astype(jnp.bfloat16)
    g = jnp.dot(oh, win, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )  # [tr, p*c]: the packed row holding each target voxel
    if p == 1:
        return g
    slot = lidx_k - grp * p
    lanes = g.shape[1]  # p*c padded to the 128-lane tile (_lanes_pad)
    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (tr, lanes), 1) // c
    return g * (lane_grp == slot[:, None]).astype(jnp.bfloat16)


def _union_dma(us_ref, feats_ref, ubuf, sems, t, p, up):
    start = pl.multiple_of(us_ref[t] // p, 8)
    return pltpu.make_async_copy(
        feats_ref.at[pl.ds(start, up), :], ubuf.at[t % 2], sems.at[t % 2]
    )


def _fwd_kernel(
    us_ref, offk_ref, lidx_ref, w_ref, feats_ref, out_ref, ubuf, sems,
    *, nk: int, tr: int, wp: int, up: int, p: int, c: int, cout: int,
    pout: int = 1,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        _union_dma(us_ref, feats_ref, ubuf, sems, 0, p, up).start()

    _union_dma(us_ref, feats_ref, ubuf, sems, t, p, up).wait()

    @pl.when(t + 1 < nt)
    def _():
        _union_dma(us_ref, feats_ref, ubuf, sems, t + 1, p, up).start()

    acc = jnp.zeros((tr, cout), jnp.float32)
    for kk in range(nk):
        offp = pl.multiple_of(offk_ref[t * nk + kk] // p, 8)
        gm = _gather_masked(lidx_ref[:, kk], ubuf, t % 2, offp, wp, p, c, tr)
        # w_ref holds slot-TILED weights [nk, p*c, cout]: dead slot blocks
        # are zero in gm, so the full-width GEMM sums only the live block
        acc = acc + jnp.dot(
            gm, w_ref[kk], preferred_element_type=jnp.float32
        )
    if pout > 1:
        # emit lane-packed rows: the sublane->lane regroup happens in VMEM
        # registers instead of as a post-hoc HBM retile pass (pad lanes come
        # out zero from the tile matrix - no separate pad needed)
        out_ref[:] = _pack_rows(acc, pout, cout, out_ref.shape[-1])
    else:
        out_ref[:] = acc


def _dw_kernel(
    us_ref, offk_ref, lidx_ref, g_ref, feats_ref, dw_ref, ubuf, sems,
    *, nk: int, tr: int, wp: int, up: int, p: int, c: int,
    pg: int = 1, cout: int = 0,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        _union_dma(us_ref, feats_ref, ubuf, sems, 0, p, up).start()

    _union_dma(us_ref, feats_ref, ubuf, sems, t, p, up).wait()

    @pl.when(t + 1 < nt)
    def _():
        _union_dma(us_ref, feats_ref, ubuf, sems, t + 1, p, up).start()

    if pg > 1:  # lane-packed upstream grad: regroup to one output row/sublane
        gq = _unpack_rows(g_ref[:], pg, cout, tr).astype(jnp.bfloat16)
    else:
        gq = g_ref[:].astype(jnp.bfloat16)  # [tr, cout]
    for kk in range(nk):
        offp = pl.multiple_of(offk_ref[t * nk + kk] // p, 8)
        gm = _gather_masked(lidx_ref[:, kk], ubuf, t % 2, offp, wp, p, c, tr)
        # accumulate the slot-EXPANDED [p*c, cout] outer products (dead slot
        # blocks are zero rows); the wrapper folds the P blocks back to
        # dW_k = sum_s dw_full[k, s*c:(s+1)*c]
        dw_ref[kk] += jax.lax.dot_general(
            gm, gq, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lanes_pad(p: int, c: int) -> int:
    """Packed-row lane count padded to the 128-lane tile: Mosaic requires
    slice/DMA lane widths aligned to 128, and odd channel counts (the first
    conv's raw features, concat skip widths) would otherwise misalign. The
    padding lanes are zero in the packed array and map to slot groups >= p,
    so the lane mask drops them for free."""
    return -(-(p * c) // 128) * 128


def _pack(feats: jnp.ndarray, p: int) -> jnp.ndarray:
    n, c = feats.shape
    fp = feats.reshape(n // p, p * c)
    lp = _lanes_pad(p, c)
    if lp != p * c:
        fp = jnp.pad(fp, ((0, 0), (0, lp - p * c)))
    return fp


def _in_pack(feats) -> tuple:
    """(packed bf16 data [n//p, lanes], n, c, p) for array or Packed input."""
    if isinstance(feats, Packed):
        return feats.data.astype(jnp.bfloat16), feats.n, feats.c, feats.p
    n, c = feats.shape
    p = _pack_factor(c)
    return _pack(feats.astype(jnp.bfloat16), p), n, c, p


def _run_fwd(feats, weights, wmap: WindowedMap, out_packed: bool = False):
    n_out, nk = wmap.idx.shape
    fp, n_in, c, p = _in_pack(feats)
    cout = weights.shape[2]
    wp = wmap.w // p
    up = wmap.u // p
    t = n_out // wmap.tr
    pout = _pack_factor(cout) if out_packed else 1
    if pout > 1 and wmap.tr % pout:
        pout = 1
    lanes_out = _lanes_pad(pout, cout) if pout > 1 else cout
    out_block = (
        (wmap.tr // pout, lanes_out) if pout > 1 else (wmap.tr, cout)
    )
    out_shape = (
        (n_out // pout, lanes_out) if pout > 1 else (n_out, cout)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # us, offk
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (wmap.tr, nk), lambda i, us, offk: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights, whole
            pl.BlockSpec(memory_space=pltpu.ANY),  # feats stay in HBM
        ],
        out_specs=pl.BlockSpec(
            out_block, lambda i, us, offk: (i, 0), memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, up, _lanes_pad(p, c)), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = partial(
        _fwd_kernel, nk=nk, tr=wmap.tr, wp=wp, up=up, p=p, c=c, cout=cout,
        pout=pout,
    )
    wtiled = jnp.tile(weights.astype(jnp.bfloat16), (1, p, 1))  # [nk, p*c, cout]
    lp = _lanes_pad(p, c)
    if lp != p * c:
        wtiled = jnp.pad(wtiled, ((0, 0), (0, lp - p * c), (0, 0)))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        wmap.us, wmap.offk.reshape(-1), wmap.lidx, wtiled, fp,
    )
    if pout > 1:
        return Packed(data=out, n=n_out, c=cout)
    return out


def _run_dw(feats, g, wmap: WindowedMap):
    n_out, nk = wmap.idx.shape
    fp, n_in, c, p = _in_pack(feats)
    wp = wmap.w // p
    up = wmap.u // p
    t = n_out // wmap.tr
    if isinstance(g, Packed):
        cout, pg = g.c, g.p
        g_arr = g.data
        g_block = (wmap.tr // pg, g_arr.shape[1])
    else:
        cout, pg = g.shape[1], 1
        g_arr = g
        g_block = (wmap.tr, cout)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(
                (wmap.tr, nk), lambda i, us, offk: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                g_block, lambda i, us, offk: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nk, _lanes_pad(p, c), cout), lambda i, us, offk: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, up, _lanes_pad(p, c)), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = partial(
        _dw_kernel, nk=nk, tr=wmap.tr, wp=wp, up=up, p=p, c=c, pg=pg,
        cout=cout,
    )
    dw_full = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (nk, _lanes_pad(p, c), cout), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(wmap.us, wmap.offk.reshape(-1), wmap.lidx, g_arr, fp)
    # fold the slot-expanded rows: dW_k = sum_s dw_full[k, s*c:(s+1)*c]
    return dw_full[:, : p * c].reshape(nk, p, c, cout).sum(axis=1)


def _corr_apply(feats, weights, wmap: WindowedMap, out):
    """Exact XLA repair of out-of-window entries: out[i] += f[idx[i,k]] @ W_k
    over the packed correction list, scatter-added INTO the conv output.

    Cost is O(corr_cap), not O(N): the previous formulation scattered into a
    dense ``[n_out, cout]`` zeros array and then added it to the output - two
    extra full passes over the tile-padded f32 output per conv (67 MB at
    131k x 16 lanes on v5e), and gathered a ``[cap, C, Cout]`` f32 weight
    tensor (67 MB at C=128). Here the per-entry contribution comes from one
    ``[cap, C] @ [C, K*Cout]`` GEMM + a one-hot offset select, and the repair
    is an in-place scatter-add on at most ``corr_cap`` rows of ``out``."""
    c = feat_width(feats)
    cout = weights.shape[2]
    nk = wmap.k
    live = wmap.corr >= 0
    e = jnp.maximum(wmap.corr, 0)
    i = e // nk
    kk = e - i * nk
    j = wmap.idx.reshape(-1)[e]  # valid by construction of corr
    f = _take_rows(feats, jnp.where(live, j, 0)).astype(jnp.float32)
    wall = weights.astype(jnp.float32).transpose(1, 0, 2).reshape(c, nk * cout)
    allk = (f @ wall).reshape(-1, nk, cout)  # [cap, K, Cout]
    oh = (kk[:, None] == jnp.arange(nk, dtype=kk.dtype)[None, :]) & live[:, None]
    contrib = jnp.sum(allk * oh[:, :, None].astype(allk.dtype), axis=1)
    if isinstance(out, Packed):
        pout = out.p
        rows = jnp.where(live, i // pout, out.data.shape[0])  # dead -> dropped
        cols = (i % pout)[:, None] * cout + jnp.arange(cout)[None, :]
        data = out.data.at[rows[:, None], cols].add(
            contrib.astype(out.dtype), mode="drop"
        )
        return out.replace(data=data)
    tgt = jnp.where(live, i, out.shape[0])  # dead entries -> dropped
    return out.at[tgt].add(contrib.astype(out.dtype), mode="drop")


def _take_rows(feats, rows: jnp.ndarray) -> jnp.ndarray:
    """Gather logical [*, c] rows from an array or Packed activation."""
    if not isinstance(feats, Packed):
        return jnp.take(feats, rows, axis=0)
    p, c = feats.p, feats.c
    grp = jnp.take(feats.data, rows // p, axis=0)  # [cap, lanes]
    cols = (rows % p)[:, None] * c + jnp.arange(c)[None, :]
    return jnp.take_along_axis(grp, cols, axis=1)


def _corr_dw(feats, g, wmap: WindowedMap):
    """dW contribution of the correction entries: dW_k += f[j] (x) g[i].

    Spread f over its offset slot and contract the entry axis in ONE
    ``[K*C, cap] @ [cap, Cout]`` GEMM - the previous formulation materialized
    the ``[cap, C, Cout]`` f32 outer-product tensor (67 MB at C=Cout=128)
    before scatter-adding it into 27 slots."""
    nk = wmap.k
    live = wmap.corr >= 0
    e = jnp.maximum(wmap.corr, 0)
    i = e // nk
    kk = e - i * nk
    j = wmap.idx.reshape(-1)[e]
    f = _take_rows(feats, jnp.where(live, j, 0)).astype(jnp.float32)
    gi = _take_rows(g, jnp.where(live, i, 0)).astype(jnp.float32)
    oh = (kk[:, None] == jnp.arange(nk, dtype=kk.dtype)[None, :]) & live[:, None]
    fk = f[:, None, :] * oh[:, :, None].astype(jnp.float32)  # [cap, K, C]
    return jnp.einsum("ekc,ed->kcd", fk, gi)


def _flip_t(weights: jnp.ndarray) -> jnp.ndarray:
    """Transpose-conv weights: reverse the (symmetric) offset order and swap
    Cin/Cout (same identity ops/conv.py relies on)."""
    return jnp.flip(weights, axis=0).transpose(0, 2, 1)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _winconv_tm(out_packed, feats, weights, wmap: WindowedMap, wmap_t: WindowedMap):
    out = _run_fwd(feats, weights, wmap, out_packed)
    return _corr_apply(feats, weights, wmap, out)


def _winconv_tm_fwd(out_packed, feats, weights, wmap, wmap_t):
    return (
        _winconv_tm(out_packed, feats, weights, wmap, wmap_t),
        (feats, weights, wmap, wmap_t),
    )


def _winconv_tm_bwd(out_packed, res, g):
    feats, weights, wmap, wmap_t = res
    w_t = _flip_t(weights)
    # dX takes the INPUT's representation: packed input -> packed grad
    gf = _run_fwd(g, w_t, wmap_t, out_packed=isinstance(feats, Packed))
    gf = _corr_apply(g, w_t, wmap_t, gf)
    if not isinstance(g, Packed):
        g = g.astype(jnp.float32)
    gw = _run_dw(feats, g, wmap) + _corr_dw(feats, g, wmap)
    return gf.astype(feats.dtype), gw.astype(weights.dtype), None, None


_winconv_tm.defvjp(_winconv_tm_fwd, _winconv_tm_bwd)


def windowed_conv(
    feats: "jnp.ndarray | Packed",
    wmap: WindowedMap,
    weights: jnp.ndarray,
    wmap_t: WindowedMap | None = None,
    out_dtype=jnp.float32,
    out_packed: bool = False,
) -> "jnp.ndarray | Packed":
    """Sparse conv through a WindowedMap (Pallas streaming kernel + exact
    correction). ``wmap_t`` is the transpose map (the map itself for
    submanifold convs); required for training (backward runs through it).

    ``feats`` may be a plain [n_in, c] array or a :class:`Packed` activation;
    ``out_packed=True`` emits a Packed output (falling back to a plain array
    when the output width doesn't pack, cout >= 128). Packed in/out keeps a
    conv chain free of the (8, 128) tile-padding HBM tax between convs."""
    if wmap_t is None:
        wmap_t = wmap
    out = _winconv_tm(bool(out_packed), feats, weights, wmap, wmap_t)
    return out.astype(out_dtype)
