"""Data-parallel training over a jax.sharding.Mesh.

The reference trains on a single GPU (SURVEY.md §2.9: no torch.distributed
anywhere); the TPU-native scale-out shards *tiles* (the spatial batch axis)
across the mesh - each device runs the full sparse pipeline on its own padded
tile batch, gradients are psum-reduced over ICI, parameters and BN statistics
stay replicated (sync-BN via pmean of the updated running stats).

shard_map is the right tool (not pjit sharding inference) because every
per-device computation is independent fixed-shape sparse logic; the only
cross-device communication is the gradient/stat reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pointgroup3heads import PanopticConfig, PointGroup3HeadsNet
from ..train.step import TrainState, batch_arrays, canonicalize, panoptic_forward, panoptic_losses
from ..ops.hierarchy import build_hierarchy


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, arrays: Tuple, axis_name: str = "data"):
    """Place [D, ...] arrays with the leading axis over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(arrays, sharding)


def make_parallel_train_step(
    cfg: PanopticConfig,
    model: PointGroup3HeadsNet,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    with_clustering: bool,
    axis_name: str = "data",
    grad_clip_value: float | None = None,
    class_weights=None,
    epoch: int | None = None,
):
    """Returns a jitted step: (replicated TrainState, [D,...] arrays) ->
    (TrainState, metrics). Gradients psum over the mesh. ``epoch`` is STATIC
    and gates the *_start_epoch mask features (see train/step.py)."""
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def device_step(state: TrainState, arrays):
        arrays = tuple(a[0] for a in arrays)  # shard_map gives [1, ...] blocks
        db = canonicalize(*arrays)
        hier = build_hierarchy(
            db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
            brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
            win_maps=cfg.win_enabled,
        )

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, new_stats = panoptic_forward(
                cfg, model, variables, db, hier, train=True,
                with_clustering=with_clustering, momentum=state.bn_momentum,
                epoch=epoch,
            )
            total, losses = panoptic_losses(
                cfg, out, db.y, db.vote_label, db.instance_labels,
                db.instance_mask, db.grid.batch, db.grid.mask,
                class_weights=cw, epoch=epoch,
            )
            return total, (losses, new_stats)

        (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, axis_name)
        if grad_clip_value is not None:
            grads = jax.tree_util.tree_map(
                lambda g: jnp.clip(g, -grad_clip_value, grad_clip_value), grads
            )
        # keep replicas bit-identical: BN stats and metrics are averaged
        new_stats = jax.lax.pmean(new_stats, axis_name)
        losses = jax.lax.pmean(losses, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, losses

    n_arrays = 9  # coords, batch, mask, feats, pos, y, inst, vote, origin
    shard_specs = tuple(P(axis_name) for _ in range(n_arrays))
    mapped = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), shard_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_parallel_eval_forward(
    cfg: PanopticConfig,
    model: PointGroup3HeadsNet,
    mesh: Mesh,
    axis_name: str = "data",
):
    """Sharded full-panoptic inference: one eval tile per device in a single
    jitted call (clustering + ScoreNet included) - the scale-out eval story
    (SURVEY §2.9 / BASELINE "full-scene batched inference ... across a v5e-8
    mesh"). Params/stats stay replicated; tiles ride the data axis; there is
    no cross-device communication - block merging happens on host in tile
    order, so results are bit-identical to the sequential path.

    Returns a jitted fn: (params, batch_stats, [D, ...] arrays) -> dict of
    [D, ...] numpy-convertible outputs (see keys below).
    """

    def device_fwd(params, batch_stats, arrays, subset_seed):
        arrays = tuple(a[0] for a in arrays)  # shard_map gives [1, ...] blocks
        db = canonicalize(*arrays)
        hier = build_hierarchy(
            db.grid, cfg.num_down, use_bricks=cfg.use_bricks,
            brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
            win_maps=cfg.win_enabled,
        )
        out, _ = panoptic_forward(
            cfg, model, {"params": params, "batch_stats": batch_stats},
            db, hier, train=False, with_clustering=True,
            # per-(vote, tile) counter: embed-family random feature subsets
            # resample per forward exactly like the sequential path
            subset_seed=subset_seed[0],
        )
        scores = out.cluster_scores
        if scores is None:
            # no scorer configured (use_score_net=False, e.g. Setting I):
            # the sequential path hands extract_clusters scores=None, which is
            # the reference's early-exit (ALL proposals, no NMS/score filter).
            # Mirror it with a NaN sentinel the host side converts back to
            # None - all-ones scores would silently run NMS + min_score
            # filtering and diverge from the sequential path (ADVICE r2).
            scores = jnp.full((cfg.total_props,), jnp.nan, jnp.float32)
        p = out.proposals
        res = dict(
            mask=db.grid.mask,
            origin=db.origin_id,
            sem=out.semantic_logits,
            point_idx=p.point_idx,
            prop_id=p.prop_id,
            member_valid=p.member_valid,
            prop_valid=p.prop_valid,
            prop_batch=p.prop_batch,
            prop_type=p.prop_type,
            scores=scores,
        )
        return {k: v[None] for k, v in res.items()}

    n_arrays = 9
    shard_specs = tuple(P(axis_name) for _ in range(n_arrays))
    mapped = jax.shard_map(
        device_fwd,
        mesh=mesh,
        in_specs=(P(), P(), shard_specs, P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(mapped)
