"""Host-side instance extraction from device proposal outputs.

Numpy equivalent of ``PanopticResults.get_instances``
(``/root/reference/torch_points3d/models/panoptic/structure_3heads.py:28-71``):
membership-matrix IoU, greedy score-descending NMS at 0.3, then min-size and
min-score filters. Operates on the padded Proposals arrays pulled to host.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def proposals_to_numpy(props) -> dict:
    return dict(
        point_idx=np.asarray(props.point_idx),
        prop_id=np.asarray(props.prop_id),
        member_valid=np.asarray(props.member_valid),
        prop_valid=np.asarray(props.prop_valid),
        prop_batch=np.asarray(props.prop_batch),
        prop_type=np.asarray(props.prop_type),
    )


def extract_clusters(
    props: dict,
    scores: Optional[np.ndarray],
    num_points: int,
    mask_scores: Optional[np.ndarray] = None,
    nms_threshold: float = 0.3,
    min_cluster_points: int = 100,
    min_score: float = 0.5,
) -> Tuple[List[np.ndarray], List[int]]:
    """Returns (clusters, kept_prop_ids); clusters are arrays of point rows.

    With scores=None (no ScoreNet) every proposal is returned unfiltered,
    matching the reference's early exit (structure_3heads.py:34-35).
    """
    ok = props["member_valid"] & (props["prop_id"] >= 0)
    if mask_scores is not None:
        ok = ok & (mask_scores > -0.5)
    pid = props["prop_id"][ok]
    pts = props["point_idx"][ok]
    valid_props = np.where(props["prop_valid"])[0]
    # one sort + run splits instead of a per-proposal boolean scan over the
    # [M] membership rows (O(M log M) vs O(P*M))
    order = np.argsort(pid, kind="stable")
    pid_s, pts_s = pid[order], pts[order]
    starts = np.searchsorted(pid_s, valid_props)
    ends = np.searchsorted(pid_s, valid_props + 1)
    members = {
        int(p): pts_s[s:e]
        for p, s, e in zip(valid_props, starts, ends)
        if e > s
    }
    if not members:
        return [], []
    if scores is None:
        keys = sorted(members)
        return [members[p] for p in keys], keys

    prop_ids = sorted(members)
    p = len(prop_ids)
    masks = np.zeros((p, num_points), dtype=bool)
    for i, pr in enumerate(prop_ids):
        masks[i, members[pr]] = True
    mf = masks.astype(np.float32)
    inter = mf @ mf.T
    sizes = mf.sum(1)
    iou = inter / np.maximum(sizes[:, None] + sizes[None, :] - inter, 1e-9)
    sc = np.asarray([scores[pr] for pr in prop_ids])

    order = np.argsort(-sc)
    suppressed = np.zeros(p, bool)
    picked = []
    for i in order:
        if suppressed[i]:
            continue
        picked.append(i)
        suppressed |= iou[i] > nms_threshold
        suppressed[i] = True
    clusters, kept = [], []
    for i in picked:
        m = members[prop_ids[i]]
        if len(m) > min_cluster_points and sc[i] > min_score:
            clusters.append(m)
            kept.append(prop_ids[i])
    return clusters, kept
