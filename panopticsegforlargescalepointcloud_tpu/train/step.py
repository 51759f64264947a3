"""Jitted forward / train steps for PointGroup3Heads.

The reference's per-batch body (``trainer.py:202-229`` + BaseModel.
optimize_parameters2) becomes two compiled step functions:

* the *prepare* step (epoch <= prepare_epoch): backbone + heads + point losses;
* the *full* step: + on-device clustering + ScoreNet + score/mask losses.

Both are pure functions of (TrainState, batch arrays); the trainer picks which
to call per epoch (two compilations instead of traced control flow around the
expensive clustering stage, mirroring the reference's epoch gate at
PointGroup3heads.py:116).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.pointgroup3heads import (
    PanopticConfig,
    PanopticOutput,
    PointGroup3HeadsNet,
    build_proposals,
    panoptic_losses,
    scorer_inputs,
)
from ..ops.hierarchy import Hierarchy, build_hierarchy
from ..ops.sparse import SparseGrid, make_grid

class DeviceBatch(NamedTuple):
    """Canonical (grid-ordered) device batch: the VoxelBatch arrays permuted
    into key-sorted SparseGrid row order."""

    grid: SparseGrid
    feats: jnp.ndarray
    pos: jnp.ndarray
    y: jnp.ndarray
    instance_labels: jnp.ndarray
    instance_mask: jnp.ndarray
    vote_label: jnp.ndarray
    origin_id: jnp.ndarray


def canonicalize(coords, batch, mask, feats, pos, y, instance_labels, vote_label, origin_id) -> DeviceBatch:
    """Build the canonical sparse grid and permute point arrays to its order."""
    grid, inverse = make_grid(batch, coords, mask)
    n = coords.shape[0]
    tgt = jnp.where(mask, inverse, n)

    def reorder(arr, fill):
        shape = (n,) + arr.shape[1:]
        out = jnp.full(shape, fill, dtype=arr.dtype)
        return out.at[tgt].set(arr, mode="drop")

    inst = reorder(instance_labels, 0)
    return DeviceBatch(
        grid=grid,
        feats=reorder(feats, 0),
        pos=reorder(pos, 0),
        y=reorder(y, -1),
        instance_labels=inst,
        instance_mask=(inst > 0) & grid.mask,
        vote_label=reorder(vote_label, 0),
        origin_id=reorder(origin_id, -1),
    )


def panoptic_forward(
    cfg: PanopticConfig,
    model: PointGroup3HeadsNet,
    variables: Dict[str, Any],
    db: DeviceBatch,
    hier: Hierarchy,
    train: bool,
    with_clustering: bool,
    momentum=0.1,
    epoch: int | None = None,
    subset_seed=None,
) -> Tuple[PanopticOutput, Dict[str, Any]]:
    """Returns (output, updated batch_stats). ``epoch`` is STATIC; it gates
    the epoch-conditional mask features (see PanopticConfig *_start_epoch).
    ``subset_seed`` (traced int) resamples the embed family's random feature
    subsets per forward like the reference's torch.multinomial."""
    # KPConv-deform internal regularizers ride a sown collection; collect it
    # only when the backbone actually produces one (training loss term)
    want_internal = train and cfg.backbone == "kpconv" and cfg.kp_deformable
    mutable = (["batch_stats", "kp_losses"] if want_internal
               else ["batch_stats"] if train else False)
    res = model.apply(
        variables,
        db.feats,
        hier,
        train,
        momentum,
        pos=db.pos,
        method=PointGroup3HeadsNet.backbone_heads,
        mutable=mutable,
    )
    internal_losses = None
    if train:
        (x, sem, off, emb), upd = res
        variables = {**variables, "batch_stats": upd["batch_stats"]}
        if want_internal:
            # sum each named regularizer over the sown layer instances
            # (reference get_named_internal_losses + sum aggregation,
            # base_model.py:363-402)
            sums: Dict[str, Any] = {}

            def walk(node):
                for k, v in node.items():
                    if isinstance(v, dict):
                        walk(v)
                    else:  # sown tuple of scalars
                        vals = v if isinstance(v, (tuple, list)) else (v,)
                        for s in vals:
                            sums[k] = sums.get(k, 0.0) + s

            walk(upd.get("kp_losses", {}))
            internal_losses = sums or None
    else:
        x, sem, off, emb = res

    props = None
    scores = None
    member_mask_scores = None
    mask_row_valid = None
    scorer_overflow = None
    cluster_overflow = None
    rg_graph_trunc = None
    if with_clustering:
        # Clustering emits integer assignments only - the reference detaches
        # them too (cluster indices carry no grad). stop_gradient keeps the
        # whole subgraph out of linearization: without it, jax.grad tries to
        # JVP-trace the Pallas mean-shift kernel and crashes on TPU (the
        # kernel has no JVP rule; CPU tests never saw it because the Pallas
        # path is TPU-only).
        sg = jax.lax.stop_gradient
        props, cluster_overflow, rg_graph_trunc = build_proposals(
            cfg, db.pos, sg(off), sg(emb), sg(sem), db.grid.batch,
            db.grid.mask, subset_seed=subset_seed,
        )
        if cfg.use_score_net and not cfg.scorer_type:
            # semantic-certainty confidence (reference _compute_score else
            # branch :442-453): max class prob of the per-cluster mean logit
            from ..ops.scatter import segment_mean

            ok = props.member_valid & (props.prop_id >= 0)
            pts = jnp.maximum(props.point_idx, 0)
            seg = jnp.where(ok, props.prop_id, -1)
            mean_logp = segment_mean(
                jnp.take(sem, pts, axis=0) * ok[:, None], seg, cfg.total_props
            )
            scores = jnp.max(jnp.exp(mean_logp), axis=-1)
            scores = jnp.where(props.prop_valid, scores, 0.0)
        elif cfg.use_score_net:
            sg, shier, sfeats, member_row, scorer_overflow = scorer_inputs(
                cfg, props, db.grid.coords, x
            )
            res2 = model.apply(
                variables,
                sfeats,
                shier,
                sg.batch,
                cfg.total_props,
                train,
                momentum,
                epoch,
                method=PointGroup3HeadsNet.score,
                mutable=mutable,
            )
            if train:
                (scores, mask_logits), upd2 = res2
                variables = {**variables, "batch_stats": upd2["batch_stats"]}
            else:
                scores, mask_logits = res2
            if mask_logits is not None:
                # Members whose voxel was dropped from the scorer grid
                # (bit-budget overflow) have member_row == -1; they must not
                # borrow row 0's logit, so mask_row_valid excludes them from
                # mask supervision (ADVICE r1 high).
                mask_row_valid = member_row >= 0
                safe = jnp.where(mask_row_valid, member_row, 0)
                member_mask_scores = jnp.take(mask_logits, safe)

    out = PanopticOutput(
        semantic_logits=sem,
        offset_logits=off,
        embed_logits=emb,
        backbone_feats=x,
        proposals=props,
        cluster_scores=scores,
        mask_scores=member_mask_scores,
        mask_row_valid=mask_row_valid,
        scorer_overflow=scorer_overflow,
        cluster_overflow=cluster_overflow,
        rg_graph_trunc=rg_graph_trunc,
        internal_losses=internal_losses,
    )
    return out, variables.get("batch_stats", {})


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    bn_momentum: jnp.ndarray  # torch-convention momentum, schedulable


def init_state(
    cfg: PanopticConfig,
    model: PointGroup3HeadsNet,
    tx: optax.GradientTransformation,
    example: DeviceBatch,
    hier: Hierarchy,
    rngkey,
    bn_momentum: float = 0.1,
) -> TrainState:
    # Jit the whole init path: on remote-compile TPU backends eager op-by-op
    # dispatch is pathologically slow, and init touches hundreds of primitives.
    @jax.jit
    def _init_variables(example: DeviceBatch, hier: Hierarchy, rngkey):
        props, _, _ = build_proposals(
            cfg,
            example.pos,
            jnp.zeros_like(example.pos),
            jnp.zeros((example.pos.shape[0], cfg.embed_dim), example.feats.dtype),
            jnp.zeros((example.pos.shape[0], cfg.num_classes), example.feats.dtype),
            example.grid.batch,
            example.grid.mask,
        )
        sg, shier, sfeats, _, _ = scorer_inputs(
            cfg, props, example.grid.coords,
            jnp.zeros((example.pos.shape[0], cfg.in_feat)),
        )
        return model.init(rngkey, example.feats, hier, sfeats, shier, sg.batch, False)

    variables = _init_variables(example, hier, rngkey)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        bn_momentum=jnp.asarray(bn_momentum, jnp.float32),
    )


def make_train_step(
    cfg: PanopticConfig,
    model: PointGroup3HeadsNet,
    tx: optax.GradientTransformation,
    with_clustering: bool,
    grad_clip_value: float | None = None,
    class_weights=None,
    epoch: int | None = None,
):
    """Returns a jitted train step: (state, raw batch arrays) -> (state, metrics).

    ``epoch`` (STATIC) gates the *_start_epoch mask features; the trainer
    rebuilds the step when a gate flips (at most two extra compiles per run).
    None = gates open whenever their boolean flag is set."""
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def step(state: TrainState, arrays) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        db = canonicalize(*arrays)
        hier = build_hierarchy(
            db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
            brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
            win_maps=cfg.win_enabled,
        )

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, new_stats = panoptic_forward(
                cfg, model, variables, db, hier,
                train=True, with_clustering=with_clustering,
                momentum=state.bn_momentum, epoch=epoch,
                subset_seed=state.step,
            )
            total, losses = panoptic_losses(
                cfg,
                out,
                db.y,
                db.vote_label,
                db.instance_labels,
                db.instance_mask,
                db.grid.batch,
                db.grid.mask,
                class_weights=cw,
                epoch=epoch,
            )
            return total, (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if grad_clip_value is not None:
            grads = jax.tree_util.tree_map(
                lambda g: jnp.clip(g, -grad_clip_value, grad_clip_value), grads
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = dict(losses)
        metrics["hier_overflow"] = jnp.sum(hier.overflow)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_forward(
    cfg: PanopticConfig,
    model: PointGroup3HeadsNet,
    with_clustering: bool = True,
    epoch: int | None = None,
):
    """Jitted inference: (params, batch_stats, arrays) -> (DeviceBatch,
    PanopticOutput). ``epoch`` = the checkpoint's training epoch (gates the
    *_start_epoch mask features exactly as during training); None = gates
    open, matching a converged reference checkpoint."""

    def fwd(params, batch_stats, arrays, subset_seed=None):
        db = canonicalize(*arrays)
        hier = build_hierarchy(
            db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
            brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
            win_maps=cfg.win_enabled,
        )
        variables = {"params": params, "batch_stats": batch_stats}
        out, _ = panoptic_forward(
            cfg, model, variables, db, hier, train=False,
            with_clustering=with_clustering, epoch=epoch,
            subset_seed=subset_seed,
        )
        return db, out

    if cfg.model_family == "embed":
        # voting runs / tiles pass a counter so the reference's per-forward
        # random feature subsets stay per-forward (yet reproducible)
        def fwd_seeded(params, batch_stats, arrays, subset_seed=0):
            return fwd(params, batch_stats, arrays,
                       jnp.asarray(subset_seed, jnp.int32))

        jitted = jax.jit(fwd_seeded)
        return lambda params, batch_stats, arrays, subset_seed=0: jitted(
            params, batch_stats, arrays, subset_seed
        )
    # non-embed families have no random-subset clustering: accept and drop
    # the counter so call sites can pass it uniformly
    jitted = jax.jit(fwd)
    return lambda params, batch_stats, arrays, subset_seed=None: jitted(
        params, batch_stats, arrays
    )


@partial(jax.jit, static_argnames=("num_down", "brick_size", "brick_factor", "win_maps"))
def prepare_example(arrays, num_down: int, brick_size: int = 2, brick_factor: float = 0.5, win_maps: bool = False):
    """Jitted canonicalize + hierarchy build for standalone (non-step) use -
    eager dispatch is too slow on remote-compile TPU backends."""
    db = canonicalize(*arrays)
    hier = build_hierarchy(
        db.grid, num_down, brick_size=brick_size,
        brick_capacity_factor=brick_factor, win_maps=win_maps,
    )
    return db, hier


def batch_arrays(vb) -> Tuple[jnp.ndarray, ...]:
    """VoxelBatch (numpy) -> the positional array tuple steps consume."""
    return (
        jnp.asarray(vb.coords),
        jnp.asarray(vb.batch),
        jnp.asarray(vb.mask),
        jnp.asarray(vb.feats),
        jnp.asarray(vb.pos),
        jnp.asarray(vb.y),
        jnp.asarray(vb.instance_labels),
        jnp.asarray(vb.vote_label),
        jnp.asarray(vb.origin_id),
    )
