"""Dense MXU min-label pull: region growing without edge lists.

Replaces the radius-graph build + edge propagation of
:mod:`.region_grow` for the compacted (``rg_point_cap``) row set with a
brute-force all-pairs formulation that maps onto the MXU/VPU instead of
gathers and sorts (the measured cost of the edge path on v5e - PLAN.md
"region grow is the cluster phase's floor; radius-graph build dominates"):

* distances come from ONE f32 matmul per (row-tile, column-chunk):
  ``d2[i,j] = qn_i + pn_j - 2 q_i . p_j`` with the query/support matrices
  pre-arranged as 8-row operands (x,y,z,norms,ones) - a [8, TR] x [8, TC]
  MXU contraction, no neighbor gathers, no candidate sorts, no k /
  cell_cap truncation (the adjacency is EXACT);
* one "pull" updates every row's label to the min label over its in-radius
  same-id neighbors: a masked min over the [TR, TC] distance block against
  the [1, TC] label row - pure VPU, everything VMEM-resident
  (qmat/smat/ids/labels at T<=49k total ~2 MB);
* connected components then converge by alternating pulls with XLA-side
  pointer jumping, exactly like the edge path's loop.

Semantics matched: torch-points-kernels ``region_grow`` BFS connectivity
(``/root/reference/torch_points3d/models/panoptic/PointGroup3heads.py:
185-210``) - two points connect iff same sample, same predicted class
(both folded into ``ids``), and distance <= radius. Unlike the edge path
there is no neighbor-budget truncation; the one approximation is f32
rounding of the matmul-form distance at the radius boundary (relative
~1e-7 * |p|^2; tiles are mean-centered so |p|^2 <= ~1e2, giving ~1e-5
absolute fuzz vs r^2 >= 3e-2 - see tests/test_dense_grow.py margins).

The Pallas kernel streams column chunks through a fori loop with the
operands held whole in VMEM; on CPU (tests) it runs in interpret mode, and
:func:`min_pull_xla` is the same math as plain XLA ops (used as the
product fallback off-TPU and as a cross-check oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BQ = 256  # query rows per grid step (sublane dim of the distance block)
_BS = 2048  # support columns per chunk (lane dim; [256, 2048] f32 = 2 MB)

_INF = float("inf")  # python literal: pallas kernels cannot capture jnp consts


def supports_dense(t: int, bq: int = _BQ, bs: int = _BS) -> bool:
    """Static predicate: the compacted row count must tile evenly (the
    standard rg_point_cap values 20480 / 49152 do)."""
    return t >= bs and t % bq == 0 and t % bs == 0


def _operands(pos: jnp.ndarray, valid: jnp.ndarray):
    """Build the [8, T] query/support matmul operands.

    ``qmat`` rows: (-2x, -2y, -2z, 1, qn, 0, 0, 0)
    ``smat`` rows: ( x,  y,  z, pn, 1, 0, 0, 0)
    so contracting the 8-row axis gives d2 = -2 q.p + pn + qn in one MXU
    pass. Invalid rows carry qn = pn = +inf: every pair involving one is
    +inf (the inf multiplies the constant-1 row, never a zero).
    """
    t = pos.shape[0]
    x = pos.astype(jnp.float32)
    n2 = jnp.sum(x * x, axis=1)
    n2 = jnp.where(valid, n2, _INF)
    one = jnp.ones((t,), jnp.float32)
    zero = jnp.zeros((t,), jnp.float32)
    qmat = jnp.stack([-2 * x[:, 0], -2 * x[:, 1], -2 * x[:, 2], one, n2,
                      zero, zero, zero])
    smat = jnp.stack([x[:, 0], x[:, 1], x[:, 2], n2, one, zero, zero, zero])
    return qmat, smat


def _pull_kernel(qmat_ref, smat_ref, idr_ref, lab_ref, idc_ref, out_ref,
                 *, bq: int, bs: int, t: int, r2: float):
    i = pl.program_id(0)
    q = qmat_ref[:, pl.ds(i * bq, bq)]  # [8, bq]
    idc = idc_ref[:]  # [bq, 1] block

    def chunk(s, run):
        d2 = jax.lax.dot_general(
            q, smat_ref[:, pl.ds(s * bs, bs)],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bs]
        ok = (d2 <= r2) & (idc == idr_ref[:, pl.ds(s * bs, bs)])
        cand = jnp.min(jnp.where(ok, lab_ref[:, pl.ds(s * bs, bs)], _INF),
                       axis=1)
        return jnp.minimum(run, cand)

    run = jax.lax.fori_loop(0, t // bs, chunk, jnp.full((bq,), _INF))
    out_ref[...] = run[:, None]


def min_pull_pallas(
    qmat: jnp.ndarray,
    smat: jnp.ndarray,
    ids: jnp.ndarray,
    labels: jnp.ndarray,
    r2: float,
    bq: int = _BQ,
    bs: int = _BS,
) -> jnp.ndarray:
    """One dense min-label pull. ``labels`` f32 row ids ([T]; invalid rows
    carry +inf or any value - their qn excludes them); returns [T] f32 min
    neighbor label per row (+inf where no neighbor, incl. invalid rows)."""
    t = ids.shape[0]
    assert supports_dense(t, bq, bs), (t, bq, bs)
    kern = functools.partial(_pull_kernel, bq=bq, bs=bs, t=t, r2=float(r2))
    return pl.pallas_call(
        kern,
        grid=(t // bq,),
        in_specs=[
            pl.BlockSpec((8, t), lambda i: (0, 0)),  # qmat whole
            pl.BlockSpec((8, t), lambda i: (0, 0)),  # smat whole
            pl.BlockSpec((1, t), lambda i: (0, 0)),  # ids row
            pl.BlockSpec((1, t), lambda i: (0, 0)),  # labels row
            pl.BlockSpec((bq, 1), lambda i: (i, 0)),  # ids col (this tile)
        ],
        out_specs=pl.BlockSpec((bq, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t, 1), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(qmat, smat, ids[None, :], labels[None, :], ids[:, None])[:, 0]


def min_pull_xla(
    qmat: jnp.ndarray,
    smat: jnp.ndarray,
    ids: jnp.ndarray,
    labels: jnp.ndarray,
    r2: float,
    bq: int = _BQ,
) -> jnp.ndarray:
    """Same pull as plain XLA ops (off-TPU fallback + kernel oracle):
    lax.map over row tiles keeps the peak footprint at [bq, T]."""
    t = ids.shape[0]
    assert t % bq == 0, (t, bq)
    qt = qmat.T.reshape(t // bq, bq, 8)
    idq = ids.reshape(t // bq, bq)

    def tile(args):
        q, idc = args
        d2 = jax.lax.dot_general(
            q, smat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, T]
        ok = (d2 <= r2) & (idc[:, None] == ids[None, :])
        return jnp.min(jnp.where(ok, labels[None, :], _INF), axis=1)

    return jax.lax.map(tile, (qt, idq)).reshape(t)


def dense_components(
    pos: jnp.ndarray,
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float,
    init_labels: jnp.ndarray,
    max_iters: int = 64,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Connected components of the exact radius graph (same-id pairs within
    ``radius``) by dense min-pulls + pointer jumping.

    ``init_labels``: int32 member-row seeds (cell_seed_labels contract: each
    valid row labeled by a member row of its subcomponent, representatives
    self-labeled; invalid rows = T). Returns int32 labels with the same
    contract, converged so every component carries its min member row.
    """
    t = pos.shape[0]
    qmat, smat = _operands(pos, valid)
    r2 = float(radius) * float(radius)
    pull1 = min_pull_pallas if (use_pallas is None or use_pallas) else min_pull_xla

    def pull(lab_i32):
        lab = lab_i32.astype(jnp.float32)
        got = pull1(qmat, smat, ids, lab, r2)
        new = jnp.minimum(lab_i32, jnp.where(
            jnp.isfinite(got), got.astype(jnp.int32), t))
        new = jnp.where(valid, new, t)
        # pointer jumping (label <- label of label): [T] gathers are far
        # cheaper than a pull and shorten chains geometrically
        for _ in range(3):
            new = jnp.minimum(
                new, jnp.take(jnp.append(new, t), jnp.minimum(new, t))
            )
        return new

    def body(state):
        labels, _, it = state
        new = pull(pull(labels))
        return new, jnp.any(new != labels), it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init_labels, jnp.bool_(True), jnp.int32(0))
    )
    return labels
