"""Full-scene panoptic evaluation: the PQ/SQ/RQ/PQ-dagger + MUCov/MWCov +
mPrec/mRec/F1 + semantic report.

Semantics of the reference's dataset-level ``final_eval``
(``/root/reference/torch_points3d/datasets/panoptic/treeins.py:99-510`` and
``npm3d.py:99-...``), generalized over the class layout:

* labels are shifted +1 so "unclassified" (-1) becomes class 0; reports run
  over ``num_classes_raw + 1`` shifted classes;
* points where neither gt nor pred semantic is a thing class are excluded
  from the instance stage (the ``idxc`` filter);
* instance groups take their class from the mode of (pred_sem | gt_sem);
* things: prec/rec @ IoU 0.5 -> RQ, SQ = mean matched IoU, PQ = SQ*RQ,
  PQ-dagger = PQ; stuff: RQ = [class IoU >= 0.5], SQ = class IoU,
  PQ-dagger = class IoU;
* F1 from mean prec/rec over thing classes.

The O(P*G) double loops of the reference are replaced by a vectorized
contingency table over (pred instance, gt instance) pairs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy import stats


def _mode(x: np.ndarray) -> int:
    return int(stats.mode(x, keepdims=False).mode)


def _group_by_class(ins: np.ndarray, sem: np.ndarray, num_classes: int):
    """Returns per-class lists of instance point-masks (ins >= 0 only)."""
    groups: List[List[np.ndarray]] = [[] for _ in range(num_classes)]
    for g in np.unique(ins):
        if g == -1:
            continue
        tmp = ins == g
        groups[_mode(sem[tmp])].append(tmp)
    return groups


def _cov_prec_rec(
    pts_in_pred, pts_in_gt, num_classes: int, at: float = 0.5
):
    """MUCov/MWCov per class + tp/fp lists + matched-IoU sums (vectorized)."""
    mucov = np.full(num_classes, np.nan)
    mwcov = np.full(num_classes, np.nan)
    total_gt = np.zeros(num_classes)
    tps = [[] for _ in range(num_classes)]
    fps = [[] for _ in range(num_classes)]
    iou_tp = np.zeros(num_classes)

    for c in range(num_classes):
        gts, preds = pts_in_gt[c], pts_in_pred[c]
        total_gt[c] = len(gts)
        if gts and preds:
            gt_m = np.stack(gts).astype(np.float64)  # [G, N]
            pr_m = np.stack(preds).astype(np.float64)  # [P, N]
            inter = pr_m @ gt_m.T  # [P, G]
            union = pr_m.sum(1)[:, None] + gt_m.sum(1)[None, :] - inter
            iou = inter / np.maximum(union, 1e-9)
            # coverage: per gt, best pred
            best_per_gt = iou.max(0)  # [G]
            mucov[c] = best_per_gt.mean()
            mwcov[c] = float((best_per_gt * gt_m.sum(1)).sum() / gt_m.sum())
            # detection: per pred, best gt
            best_per_pred = iou.max(1)  # [P]
            tp = (best_per_pred >= at).astype(float)
            tps[c] = tp.tolist()
            fps[c] = (1.0 - tp).tolist()
            iou_tp[c] = float(best_per_pred[best_per_pred >= at].sum())
        elif gts and not preds:
            mucov[c] = 0.0
            mwcov[c] = 0.0
        elif preds and not gts:
            tps[c] = [0.0] * len(preds)
            fps[c] = [1.0] * len(preds)
    return mucov, mwcov, total_gt, tps, fps, iou_tp


def final_eval(
    pre_sem: np.ndarray,
    pre_ins: np.ndarray,
    gt_sem: np.ndarray,
    gt_ins: np.ndarray,
    num_classes_raw: int,
    thing_classes_raw: Sequence[int],
    stuff_classes_raw: Sequence[int],
    output_file: Optional[str] = None,
    at: float = 0.5,
) -> Dict[str, float]:
    """Compute the full report. Raw label conventions follow the pipeline:
    semantic in [0, C) with -1 = unclassified; instance ids with -1/0 = none
    (pred uses -1, gt uses 0 like the reference exporters)."""
    C = num_classes_raw + 1  # shifted space, 0 = unclassified
    things = [c + 1 for c in thing_classes_raw]
    stuff = [c + 1 for c in stuff_classes_raw]
    sem_classcount = sorted(things + stuff)

    pred_sem_c = np.asarray(pre_sem).reshape(-1).astype(np.int64) + 1
    gt_sem_c = np.asarray(gt_sem).reshape(-1).astype(np.int64) + 1
    pred_ins_c = np.asarray(pre_ins).reshape(-1).astype(np.int64)
    gt_ins_c = np.asarray(gt_ins).reshape(-1).astype(np.int64)
    # gt instance 0 = none -> -1 for the grouping stage
    gt_ins_c = np.where(gt_ins_c == 0, -1, gt_ins_c)

    # ---------- semantic ----------
    gt_classes = np.bincount(gt_sem_c, minlength=C).astype(np.float64)
    pos_classes = np.bincount(pred_sem_c, minlength=C).astype(np.float64)
    tp_classes = np.bincount(
        gt_sem_c[gt_sem_c == pred_sem_c], minlength=C
    ).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        iou_list = tp_classes / (gt_classes + pos_classes - tp_classes)
    iou_list = np.nan_to_num(iou_list)
    oacc = tp_classes.sum() / max(pos_classes.sum(), 1e-9)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc_per = tp_classes / gt_classes
    macc = float(np.nan_to_num(acc_per[sem_classcount]).mean())
    miou = float(iou_list[sem_classcount].sum() / len(sem_classcount))

    # ---------- instance filter (idxc) ----------
    gt_is_thing = np.isin(gt_sem_c, things)
    pred_is_thing = np.isin(pred_sem_c, things)
    idxc = gt_is_thing | pred_is_thing
    p_ins, g_ins = pred_ins_c[idxc], gt_ins_c[idxc]
    p_sem, g_sem = pred_sem_c[idxc], gt_sem_c[idxc]

    pts_in_pred = _group_by_class(p_ins, p_sem, C)
    pts_in_gt = _group_by_class(g_ins, g_sem, C)
    mucov, mwcov, total_gt, tps, fps, iou_tp = _cov_prec_rec(
        pts_in_pred, pts_in_gt, C, at
    )

    precision = np.zeros(C)
    recall = np.zeros(C)
    RQ = np.zeros(C)
    SQ = np.zeros(C)
    PQ = np.zeros(C)
    PQStar = np.zeros(C)
    for c in things:
        tp = float(np.sum(tps[c]))
        fp = float(np.sum(fps[c]))
        rec = tp / total_gt[c] if total_gt[c] else 0.0
        prec = tp / (tp + fp) if (tp + fp) else 0.0
        precision[c], recall[c] = prec, rec
        RQ[c] = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
        SQ[c] = iou_tp[c] / tp if tp else 0.0
        PQ[c] = SQ[c] * RQ[c]
        PQStar[c] = PQ[c]
    for c in stuff:
        if iou_list[c] >= 0.5:
            RQ[c], SQ[c] = 1.0, iou_list[c]
        else:
            RQ[c], SQ[c] = 0.0, 0.0
        PQ[c] = SQ[c] * RQ[c]
        PQStar[c] = iou_list[c]

    mprec = float(precision[things].mean())
    mrec = float(recall[things].mean())
    f1 = 2 * mprec * mrec / (mprec + mrec) if (mprec + mrec) else 0.0

    metrics = {
        "oAcc": float(oacc),
        "mAcc": macc,
        "mIoU": miou,
        "mMUCov": float(np.nanmean(mucov[things])) if len(things) else 0.0,
        "mMWCov": float(np.nanmean(mwcov[things])) if len(things) else 0.0,
        "mPrec": mprec,
        "mRec": mrec,
        "F1": float(f1),
        "meanRQ": float(RQ[sem_classcount].mean()),
        "meanSQ": float(SQ[sem_classcount].mean()),
        "meanPQ": float(PQ[sem_classcount].mean()),
        "meanPQStar": float(PQStar[sem_classcount].mean()),
        "meanRQ_things": float(RQ[things].mean()),
        "meanSQ_things": float(SQ[things].mean()),
        "meanPQ_things": float(PQ[things].mean()),
        "meanRQ_stuff": float(RQ[stuff].mean()) if stuff else 0.0,
        "meanSQ_stuff": float(SQ[stuff].mean()) if stuff else 0.0,
        "meanPQ_stuff": float(PQ[stuff].mean()) if stuff else 0.0,
    }
    for c in sem_classcount:
        metrics[f"IoU_{c - 1}"] = float(iou_list[c])
    for c in things:
        metrics[f"PQ_{c - 1}"] = float(PQ[c])
        metrics[f"Prec_{c - 1}"] = float(precision[c])
        metrics[f"Rec_{c - 1}"] = float(recall[c])

    if output_file:
        with open(output_file + ".txt", "a") as f:
            f.write("Semantic Segmentation oAcc: {}\n".format(metrics["oAcc"]))
            f.write("Semantic Segmentation mAcc: {}\n".format(metrics["mAcc"]))
            f.write("Semantic Segmentation IoU: {}\n".format(iou_list.tolist()))
            f.write("Semantic Segmentation mIoU: {}\n".format(metrics["mIoU"]))
            f.write("Instance Segmentation mMUCov: {}\n".format(metrics["mMUCov"]))
            f.write("Instance Segmentation mMWCov: {}\n".format(metrics["mMWCov"]))
            f.write("Instance Segmentation mPrecision: {}\n".format(metrics["mPrec"]))
            f.write("Instance Segmentation mRecall: {}\n".format(metrics["mRec"]))
            f.write("Instance Segmentation F1 score: {}\n".format(metrics["F1"]))
            f.write("Instance Segmentation meanRQ: {}\n".format(metrics["meanRQ"]))
            f.write("Instance Segmentation meanSQ: {}\n".format(metrics["meanSQ"]))
            f.write("Instance Segmentation meanPQ: {}\n".format(metrics["meanPQ"]))
            f.write(
                "Instance Segmentation mean PQ star: {}\n".format(metrics["meanPQStar"])
            )
            f.write(
                "Instance Segmentation meanPQ (things): {}\n".format(
                    metrics["meanPQ_things"]
                )
            )
            f.write(
                "Instance Segmentation meanPQ (stuff): {}\n".format(
                    metrics["meanPQ_stuff"]
                )
            )
    return metrics
