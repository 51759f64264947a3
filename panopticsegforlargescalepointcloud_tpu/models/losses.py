"""Panoptic losses: semantic NLL, offset L1+cosine, discriminative embedding,
score (IoU-target BCE) and mask losses.

Formula-level ports of ``/root/reference/torch_points3d/core/losses/
panoptic_losses.py`` (offset_loss :7-23, discriminative_loss_single :230-343,
instance_iou_loss :92-114, mask_loss :156-201) re-expressed for fixed shapes:
instead of Python lists of variable-size clusters, proposals are a padded
*membership table* (point_idx, prop_id) and instances are compact per-sample
ids in [1, K], so every reduction is a segment op and the whole loss stack
jits once.

All reductions are fp32.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.scatter import segment_max, segment_mean, segment_sum

IGNORE_LABEL = -1


def semantic_nll_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean NLL over valid rows with label != IGNORE_LABEL.

    ``log_probs`` are log-softmax outputs (the reference's Semantic head ends
    in LogSoftmax and uses ``nll_loss`` with ignore_index=-1). With
    ``class_weights`` ([C], the dataset's sqrt-inv-frequency weights, see
    base_dataset.py:531-561) it matches torch's weighted nll_loss:
    sum(w[y]*nll) / sum(w[y])."""
    ok = valid & (labels != IGNORE_LABEL)
    safe = jnp.maximum(labels, 0)
    nll = -jnp.take_along_axis(
        log_probs.astype(jnp.float32), safe[:, None], axis=-1
    )[:, 0]
    if class_weights is not None:
        w = jnp.take(class_weights.astype(jnp.float32), safe)
        w = jnp.where(ok, w, 0.0)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)
    nll = jnp.where(ok, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)


def offset_loss(
    pred_offsets: jnp.ndarray,
    gt_offsets: jnp.ndarray,
    instance_mask: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """L1 + cosine-direction vote loss (PointGroup eqs. 2-3).

    Sums run over instance points only; denominator = count of instance points
    (reference divides by total_instance_points, :14 and :21)."""
    m = instance_mask.astype(jnp.float32)
    total = jnp.sum(m)
    diff = (pred_offsets - gt_offsets).astype(jnp.float32)
    pt_dist = jnp.sum(jnp.abs(diff), axis=-1)
    norm_loss = jnp.sum(pt_dist * m) / (total + 1e-6)

    gt_norm = jnp.linalg.norm(gt_offsets.astype(jnp.float32), axis=-1)
    gt_unit = gt_offsets.astype(jnp.float32) / (gt_norm[:, None] + 1e-8)
    pr_norm = jnp.linalg.norm(pred_offsets.astype(jnp.float32), axis=-1)
    pr_unit = pred_offsets.astype(jnp.float32) / (pr_norm[:, None] + 1e-8)
    direction_diff = -jnp.sum(gt_unit * pr_unit, axis=-1)
    dir_loss = jnp.sum(direction_diff * m) / (total + 1e-6)
    return {"offset_norm_loss": norm_loss, "offset_dir_loss": dir_loss}


def discriminative_loss(
    embed: jnp.ndarray,
    instance_labels: jnp.ndarray,
    batch: jnp.ndarray,
    instance_mask: jnp.ndarray,
    num_samples: int,
    max_instances: int,
    delta_v: float = 0.5,
    delta_d: float = 1.5,
    param_var: float = 1.0,
    param_dist: float = 1.0,
    param_reg: float = 0.001,
) -> Dict[str, jnp.ndarray]:
    """Pull/push/regularize embedding loss (De Brabandere et al.), L1 norms.

    Matches discriminative_loss_single (:230-343): per sample, means mu_k over
    each instance; l_var = mean_k mean_points relu(||x-mu||_1 - dv)^2;
    l_dist = mean over ordered pairs relu(2*dd - ||mu_i-mu_j||_1)^2 (0 if
    one instance); l_reg = mean_k ||mu_k||_1. Final: mean over samples that
    contain instance points (the reference iterates unique(batch) of the
    pre-masked tensors, :213-227).

    Args:
      embed: [N, E]; instance_labels: [N] compact ids in [1, K] (0 = none);
      batch: [N] sample ids; instance_mask: [N] bool (valid & label>0);
      num_samples/max_instances: static B, K.
    """
    e = embed.astype(jnp.float32)
    b_count, k_count = num_samples, max_instances
    seg = jnp.where(
        instance_mask, batch * k_count + (instance_labels - 1), -1
    )
    n_seg = b_count * k_count
    mu = segment_mean(e, seg, n_seg)  # [B*K, E]
    counts = segment_sum(instance_mask.astype(jnp.float32), seg, n_seg)
    present = counts > 0  # [B*K]

    # l_var: relu(||x - mu_seg||_1 - dv)^2 averaged per instance then per sample
    mu_per_point = jnp.take(mu, jnp.maximum(seg, 0), axis=0)
    d = jnp.sum(jnp.abs(e - mu_per_point), axis=-1)
    d = jnp.square(jnp.maximum(d - delta_v, 0.0))
    var_per_inst = segment_sum(jnp.where(instance_mask, d, 0.0), seg, n_seg) / (
        counts + 1e-8
    )
    var_per_inst = var_per_inst.reshape(b_count, k_count)
    present_bk = present.reshape(b_count, k_count)
    n_inst = jnp.sum(present_bk.astype(jnp.float32), axis=1)  # [B]
    l_var_s = jnp.sum(var_per_inst, axis=1) / jnp.maximum(n_inst, 1.0)

    # l_dist: pairwise push between instance means within each sample
    mu_bk = mu.reshape(b_count, k_count, -1)
    pd = jnp.sum(
        jnp.abs(mu_bk[:, :, None, :] - mu_bk[:, None, :, :]), axis=-1
    )  # [B, K, K]
    push = jnp.square(jnp.maximum(2.0 * delta_d - pd, 0.0))
    pair_ok = (
        present_bk[:, :, None]
        & present_bk[:, None, :]
        & ~jnp.eye(k_count, dtype=bool)[None]
    )
    n_pairs = jnp.sum(pair_ok.astype(jnp.float32), axis=(1, 2))
    l_dist_s = jnp.where(
        n_inst > 1,
        jnp.sum(jnp.where(pair_ok, push, 0.0), axis=(1, 2)) / jnp.maximum(n_pairs, 1.0),
        0.0,
    )

    # l_reg: mean_k ||mu_k||_1
    reg = jnp.sum(jnp.abs(mu_bk), axis=-1)  # [B, K]
    l_reg_s = jnp.sum(jnp.where(present_bk, reg, 0.0), axis=1) / jnp.maximum(n_inst, 1.0)

    has_inst = n_inst > 0
    l_var_s = jnp.where(has_inst, l_var_s, 0.0)
    l_reg_s = jnp.where(has_inst, l_reg_s, 0.0)
    loss_s = param_var * l_var_s + param_dist * l_dist_s + param_reg * l_reg_s

    # mean over samples that had any instance point (reference skips absent
    # samples entirely by iterating unique(batch))
    denom = jnp.maximum(jnp.sum(has_inst.astype(jnp.float32)), 1.0)
    mean = lambda v: jnp.sum(v) / denom  # noqa: E731
    return {
        "ins_loss": mean(loss_s),
        "ins_var_loss": mean(param_var * l_var_s),
        "ins_dist_loss": mean(param_dist * l_dist_s),
        "ins_reg_loss": mean(param_reg * l_reg_s),
    }


class Proposals(NamedTuple):
    """Padded proposal membership table.

    Attributes:
      point_idx: [M] int32 row index into the voxel arrays (-1 pad).
      prop_id: [M] int32 proposal id in [0, P) (-1 pad).
      member_valid: [M] bool.
      prop_valid: [P] bool valid proposal flags.
      prop_batch: [P] int32 sample id per proposal (-1 pad).
      prop_type: [P] int32 source tag (0 region-grow, 1 vote, 2 embed, ...).
    """

    point_idx: jnp.ndarray
    prop_id: jnp.ndarray
    member_valid: jnp.ndarray
    prop_valid: jnp.ndarray
    prop_batch: jnp.ndarray
    prop_type: jnp.ndarray

    @property
    def num_props(self) -> int:
        return self.prop_valid.shape[0]

    @property
    def budget(self) -> int:
        return self.point_idx.shape[0]


def instance_iou(
    proposals: Proposals,
    instance_labels: jnp.ndarray,
    batch: jnp.ndarray,
    num_samples: int,
    max_instances: int,
    member_pass: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """IoU between every proposal and every GT instance.

    Fixed-shape equivalent of torch-points-kernels ``instance_iou`` as used at
    panoptic_losses.py:37. GT instances are addressed as batch*K + (label-1).

    ``member_pass`` ([M] bool) enables the reference's mask-based IoU
    (``cal_iou_based_on_mask``, panoptic_losses.py:25-90): membership rows
    whose sigmoid mask score fails the 0.5 gate are excluded from both the
    intersection and the proposal size (GT sizes unchanged). Callers pass
    True for members without a scorer-grid row (the reference scores every
    member; a dropped row must not silently shrink the proposal).

    Returns [P, B*K] fp32 IoU (0 for absent instances / invalid proposals).
    """
    p = proposals.num_props
    n_gt = num_samples * max_instances
    pt = jnp.maximum(proposals.point_idx, 0)
    lbl = jnp.take(instance_labels, pt)
    bat = jnp.take(batch, pt)
    member_ok = proposals.member_valid & (proposals.prop_id >= 0)
    if member_pass is not None:
        member_ok = member_ok & member_pass
    gt_of_member = jnp.where(
        member_ok & (lbl > 0), bat * max_instances + (lbl - 1), -1
    )
    pair = jnp.where(
        gt_of_member >= 0, proposals.prop_id * n_gt + gt_of_member, -1
    )
    inter = segment_sum(
        jnp.ones_like(pair, dtype=jnp.float32), pair, p * n_gt
    ).reshape(p, n_gt)
    prop_size = segment_sum(
        member_ok.astype(jnp.float32),
        jnp.where(member_ok, proposals.prop_id, -1),
        p,
    )
    gt_seg = jnp.where(instance_labels > 0, batch * max_instances + (instance_labels - 1), -1)
    gt_size = segment_sum(jnp.ones_like(gt_seg, dtype=jnp.float32), gt_seg, n_gt)
    union = prop_size[:, None] + gt_size[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
    return jnp.where(proposals.prop_valid[:, None], iou, 0.0)


def instance_iou_loss(
    ious: jnp.ndarray,
    cluster_scores: jnp.ndarray,
    prop_valid: jnp.ndarray,
    min_iou_threshold: float = 0.25,
    max_iou_threshold: float = 0.75,
) -> jnp.ndarray:
    """BCE(score, shat) with shat = clamp-linear ramp of max-IoU
    (PointGroup eq. 7; reference instance_iou_loss :92-114)."""
    max_iou = jnp.max(ious, axis=1)
    shat = jnp.clip(
        (max_iou - min_iou_threshold) / (max_iou_threshold - min_iou_threshold),
        0.0,
        1.0,
    )
    s = jnp.clip(cluster_scores.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    bce = -(shat * jnp.log(s) + (1.0 - shat) * jnp.log(1.0 - s))
    m = prop_valid.astype(jnp.float32)
    return jnp.sum(bce * m) / jnp.maximum(jnp.sum(m), 1.0)


def mask_loss(
    ious: jnp.ndarray,
    proposals: Proposals,
    mask_scores_sigmoid: jnp.ndarray,
    instance_labels: jnp.ndarray,
    max_instances: int,
    member_scored: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-point mask BCE against the best-matching GT instance
    (reference mask_loss :156-201): members of proposals whose max IoU > 0.5
    get label 1 if the point belongs to the argmax GT instance else 0; other
    proposals contribute nothing (weight 0).

    ``member_scored`` ([M] bool) excludes members with no scorer-grid row
    (bit-budget overflow) - their gathered logit belongs to another proposal.
    """
    max_iou = jnp.max(ious, axis=1)
    arg = jnp.argmax(ious, axis=1)
    best_label = (arg % max_instances) + 1  # compact per-sample id
    supervised = (max_iou > 0.5) & proposals.prop_valid  # [P]

    pid = jnp.maximum(proposals.prop_id, 0)
    member_ok = proposals.member_valid & (proposals.prop_id >= 0)
    if member_scored is not None:
        member_ok = member_ok & member_scored
    sup_m = jnp.take(supervised, pid) & member_ok
    tgt = (
        jnp.take(instance_labels, jnp.maximum(proposals.point_idx, 0))
        == jnp.take(best_label, pid)
    ).astype(jnp.float32)
    s = jnp.clip(mask_scores_sigmoid.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    bce = -(tgt * jnp.log(s) + (1.0 - tgt) * jnp.log(1.0 - s))
    w = sup_m.astype(jnp.float32)
    # reference uses weighted BCE normalized over ALL member rows (weight
    # zeros only the unsupervised ones), matching F.binary_cross_entropy
    # with `weight=` semantics (mean over all elements).
    denom = jnp.maximum(jnp.sum(member_ok.astype(jnp.float32)), 1.0)
    return jnp.sum(bce * w) / denom
