"""Proposal NMS and instance extraction.

Equivalent of ``PanopticResults.get_instances`` in the reference
(``/root/reference/torch_points3d/models/panoptic/structure_3heads.py:28-71``):
pairwise proposal IoU via the membership-matrix matmul, greedy
score-descending NMS at threshold 0.3, then min-size (100) and min-score
(0.5) filters.

The pairwise IoU is MXU work ([P, N] @ [N, P]); the greedy selection is an
inherently sequential fori_loop over P proposals with vectorized suppression
(P <= a few hundred, negligible).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.losses import Proposals
from ..ops.scatter import segment_sum


def proposal_masks(props: Proposals, num_points: int) -> jnp.ndarray:
    """Dense [P, N] float membership matrix (optionally mask-score filtered)."""
    p = props.num_props
    ok = props.member_valid & (props.prop_id >= 0) & (props.point_idx >= 0)
    flat = jnp.where(ok, props.prop_id * num_points + props.point_idx, -1)
    m = segment_sum(jnp.ones_like(flat, jnp.float32), flat, p * num_points)
    return jnp.minimum(m.reshape(p, num_points), 1.0)


def pairwise_iou(masks: jnp.ndarray) -> jnp.ndarray:
    inter = masks @ masks.T  # [P, P]
    sizes = jnp.sum(masks, axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


class NMSResult(NamedTuple):
    keep: jnp.ndarray  # [P] bool - survives NMS + filters
    point_instance: jnp.ndarray  # [N] int32 instance id (-1 none); later
    # proposals in score order overwrite earlier ones only where unassigned


def greedy_nms(
    ious: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float = 0.3,
) -> jnp.ndarray:
    """Greedy score-descending NMS; returns keep mask [P]."""
    p = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(t, st):
        keep, suppressed = st
        i = order[t]
        active = valid[i] & ~suppressed[i]
        keep = keep.at[i].set(active)
        sup_row = (ious[i] > threshold) & active
        # do not suppress self-less: suppress everything above threshold except i itself
        sup_row = sup_row.at[i].set(False)
        return keep, suppressed | sup_row

    keep, _ = jax.lax.fori_loop(
        0, p, body, (jnp.zeros(p, bool), jnp.zeros(p, bool))
    )
    return keep


def get_instances(
    props: Proposals,
    scores: jnp.ndarray,
    num_points: int,
    mask_scores: jnp.ndarray | None = None,
    nms_threshold: float = 0.3,
    min_cluster_points: int = 100,
    min_score: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS + filters; returns (keep [P] bool, masks [P, N]).

    Mirrors get_instances: mask-score filter at -0.5 on raw logits when the
    mask head is active (structure_3heads.py:38), pairwise-IoU NMS at 0.3,
    then size > min_cluster_points and score > min_score.
    """
    masks = proposal_masks(props, num_points)
    if mask_scores is not None:
        # member rows with mask logit <= -0.5 leave the proposal mask
        ok = props.member_valid & (props.prop_id >= 0) & (mask_scores > -0.5)
        flat = jnp.where(ok, props.prop_id * num_points + props.point_idx, -1)
        m = segment_sum(jnp.ones_like(flat, jnp.float32), flat, props.num_props * num_points)
        masks = jnp.minimum(m.reshape(props.num_props, num_points), 1.0)
    ious = pairwise_iou(masks)
    keep = greedy_nms(ious, scores, props.prop_valid, nms_threshold)
    sizes = jnp.sum(masks, axis=1)
    keep = keep & (sizes > min_cluster_points) & (scores > min_score)
    return keep, masks
