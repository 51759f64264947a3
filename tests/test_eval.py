"""Eval layer tests: confusion matrix, PQ suite on fixtures with known
answers, block merging consistency, AP meter."""

import numpy as np

from panopticsegforlargescalepointcloud_tpu.eval import (
    ConfusionMatrix,
    InstanceAPMeter,
    SceneAccumulator,
    block_merging,
    compute_acc,
    compute_eval,
    final_eval,
    voc_ap,
)
from panopticsegforlargescalepointcloud_tpu.eval.instance_metrics import _Instance


class TestConfusion:
    def test_basic(self):
        c = ConfusionMatrix(3)
        c.count_predicted_batch(np.array([0, 0, 1, 2]), np.array([0, 1, 1, 2]))
        assert c.get_overall_accuracy() == 0.75
        iou, present = c.get_intersection_union_per_class()
        np.testing.assert_allclose(iou, [0.5, 0.5, 1.0])
        assert c.get_average_intersection_union() == (0.5 + 0.5 + 1.0) / 3


class TestFinalEval:
    def make_scene(self):
        """3 classes (0 stuff 'ground', 1 stuff, 2 thing), 2 gt instances."""
        n = 1000
        sem = np.zeros(n, np.int64)
        sem[:300] = 2
        sem[300:500] = 1
        ins = np.zeros(n, np.int64)
        ins[:150] = 1
        ins[150:300] = 2
        return sem, ins

    def test_perfect_prediction(self):
        sem, ins = self.make_scene()
        pred_ins = np.where(ins > 0, ins.astype(np.int64) * 7, -1)  # arbitrary ids
        m = final_eval(
            sem, pred_ins, sem, ins,
            num_classes_raw=3, thing_classes_raw=[2], stuff_classes_raw=[0, 1],
        )
        assert m["oAcc"] == 1.0
        assert m["mIoU"] == 1.0
        assert m["F1"] == 1.0
        assert m["meanPQ_things"] == 1.0
        assert m["meanPQ_stuff"] == 1.0
        assert m["mMUCov"] == 1.0

    def test_half_detected(self):
        sem, ins = self.make_scene()
        # only instance 1 predicted, correctly
        pred_ins = np.where(ins == 1, 5, -1).astype(np.int64)
        m = final_eval(
            sem, pred_ins, sem, ins,
            num_classes_raw=3, thing_classes_raw=[2], stuff_classes_raw=[0, 1],
        )
        # prec 1, rec 0.5 -> F1 = 2/3; SQ = 1; RQ = 2/3; PQ = 2/3
        np.testing.assert_allclose(m["mPrec"], 1.0)
        np.testing.assert_allclose(m["mRec"], 0.5)
        np.testing.assert_allclose(m["F1"], 2 / 3, rtol=1e-6)
        np.testing.assert_allclose(m["meanPQ_things"], 2 / 3, rtol=1e-6)
        np.testing.assert_allclose(m["mMUCov"], 0.5)

    def test_bad_semantic_kills_stuff_pq(self):
        sem, ins = self.make_scene()
        pred_sem = sem.copy()
        # destroy class-1 segmentation (IoU < 0.5)
        pred_sem[300:500] = 0
        pred_ins = np.where(ins > 0, ins.astype(np.int64), -1)
        m = final_eval(
            pred_sem, pred_ins, sem, ins,
            num_classes_raw=3, thing_classes_raw=[2], stuff_classes_raw=[0, 1],
        )
        # stuff class 1 has RQ 0 -> meanPQ_stuff only from class 0
        assert m["meanPQ_stuff"] < 0.5


def _cov_prec_rec_dense(p_ins, p_sem, g_ins, g_sem, num_classes, at=0.5):
    """Independent oracle: the original dense-mask formulation of
    _cov_prec_rec (per-instance [*, N] float64 masks + matmul IoU), kept
    here to pin the sparse-contingency rewrite."""
    from scipy import stats

    def group(ins, sem):
        groups = [[] for _ in range(num_classes)]
        for g in np.unique(ins):
            if g == -1:
                continue
            tmp = ins == g
            groups[int(stats.mode(sem[tmp], keepdims=False).mode)].append(tmp)
        return groups

    pts_in_gt = group(g_ins, g_sem)
    pts_in_pred = group(p_ins, p_sem)
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
            gt_m = np.stack(gts).astype(np.float64)
            pr_m = np.stack(preds).astype(np.float64)
            inter = pr_m @ gt_m.T
            union = pr_m.sum(1)[:, None] + gt_m.sum(1)[None, :] - inter
            iou = inter / np.maximum(union, 1e-9)
            best_per_gt = iou.max(0)
            mucov[c] = best_per_gt.mean()
            mwcov[c] = float((best_per_gt * gt_m.sum(1)).sum() / gt_m.sum())
            best_per_pred = iou.max(1)
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


class TestSparseCovPrecRec:
    """The sparse-contingency _cov_prec_rec must match the dense-mask
    formulation exactly (it replaced 12 s of the 24.5 s e2e scene)."""

    def test_random_scenes_match_dense(self):
        from panopticsegforlargescalepointcloud_tpu.eval.panoptic_quality import (
            _cov_prec_rec,
        )

        rng = np.random.default_rng(7)
        for trial in range(8):
            n = 3000
            C = 5
            # overlapping random instance partitions with noise labels; -1
            # rows (no instance) on both sides; class votes non-uniform so
            # mode ties happen
            g_ins = rng.integers(-1, 12, n)
            p_ins = np.where(
                rng.random(n) < 0.8, g_ins + rng.integers(0, 3, n), -1
            )
            g_sem = rng.integers(0, C, n)
            p_sem = np.where(rng.random(n) < 0.7, g_sem, rng.integers(0, C, n))
            a = _cov_prec_rec(p_ins, p_sem, g_ins, g_sem, C)
            b = _cov_prec_rec_dense(p_ins, p_sem, g_ins, g_sem, C)
            for x, y, name in zip(
                a, b, ["mucov", "mwcov", "total_gt", "tps", "fps", "iou_tp"]
            ):
                if name in ("tps", "fps"):
                    # per-class multisets of tp/fp flags (dense row order is
                    # mask-list order, sparse is compact-id order)
                    for c in range(C):
                        assert sorted(x[c]) == sorted(y[c]), (trial, name, c)
                else:
                    np.testing.assert_allclose(
                        x, y, rtol=1e-12, atol=1e-12, err_msg=f"{trial}:{name}"
                    )


class TestBlockMerging:
    def test_two_tiles_merge_one_instance(self, rng):
        # scene of 200 points; an instance spans both tiles
        pos = rng.random((200, 3)).astype(np.float32)
        tile1 = np.arange(0, 120)
        tile2 = np.arange(80, 200)
        all_pre = -np.ones(200, np.int64)
        # tile1 predicts points 50..120 as one instance (ids local to tile)
        pre1 = -np.ones(120, np.int64)
        pre1[50:] = 0
        all_pre, maxi = block_merging(pos, tile1, tile1, pre1, all_pre, 0)
        assert maxi == 1
        assert (all_pre[50:120] == 0).all()
        # tile2 predicts points 80..150 as one instance -> overlaps 40 pts
        pre2 = -np.ones(120, np.int64)
        pre2[:70] = 0  # rows 0..70 of tile2 = scene 80..150
        all_pre2, maxi2 = block_merging(pos, tile2, tile2, pre2, all_pre, maxi)
        # IoU vs existing = 40/100 > 0.1 -> adopt id 0
        assert (all_pre2[120:150] == 0).all()
        assert maxi2 == maxi

    def test_low_iou_new_instance(self, rng):
        pos = rng.random((100, 3)).astype(np.float32)
        tile = np.arange(100)
        all_pre = -np.ones(100, np.int64)
        all_pre[:50] = 7  # pre-existing instance
        pre = -np.ones(100, np.int64)
        pre[48:90] = 0  # overlap = 2 of union 90 -> iou < 0.1 -> new id
        out, maxi = block_merging(pos, tile, tile, pre, all_pre, 8)
        assert (out[50:90] == 9).all()
        assert (out[:50] == 7).all()
        assert maxi == 9


class TestSceneAccumulator:
    def test_votes_and_finalise(self, rng):
        n, c = 300, 3
        pos = rng.random((n, 3)).astype(np.float32) * 10
        acc = SceneAccumulator(pos, c)
        ids = np.arange(n)
        logits = np.zeros((n, c), np.float32)
        gt_sem = np.zeros(n, np.int64)
        gt_sem[:100] = 2
        logits[np.arange(n), gt_sem] = 5.0
        clusters = [np.arange(0, 50), np.arange(50, 100)]
        acc.add_tile(ids, logits, ids, clusters, np.array([0.9, 0.8]))
        sem, ins = acc.finalise(stuff_classes=(0, 1), min_instance_size=10)
        np.testing.assert_array_equal(sem, gt_sem)
        assert (ins[:50] >= 0).all()
        assert len(np.unique(ins[:50])) == 1
        assert len(np.unique(ins[50:100])) == 1
        assert np.unique(ins[:50])[0] != np.unique(ins[50:100])[0]
        assert (ins[100:] == -1).all()
        assert acc.vote_miou(gt_sem, c) == 100.0


class TestBatchInstanceMetrics:
    def test_compute_acc_and_eval(self):
        n = 100
        batch = np.zeros(n, np.int64)
        inst = np.zeros(n, np.int64)
        inst[:30] = 1
        inst[30:60] = 2
        gt_sem = np.where(inst > 0, 2, 0)
        pred = gt_sem.copy()
        clusters = [np.arange(0, 30), np.arange(30, 60)]
        tp, fp, acc = compute_acc(clusters, pred, inst, gt_sem, batch, 2)
        assert (tp, fp, acc) == (1.0, 0.0, 1.0)
        cov, wcov, mprec, mrec, f1 = compute_eval(
            clusters, pred, inst, gt_sem, batch, 3, [2]
        )
        assert cov == wcov == mprec == mrec == f1 == 1.0

    def test_ap_meter(self):
        m = InstanceAPMeter()
        gt = [_Instance(1, -1, np.arange(10), 0), _Instance(1, -1, np.arange(20, 30), 0)]
        preds = [
            _Instance(1, 0.9, np.arange(10), 0),       # match
            _Instance(1, 0.8, np.arange(50, 60), 0),   # miss
        ]
        m.add(preds, gt)
        rec, prec, ap = m.eval(0.5)
        np.testing.assert_allclose(rec[1][-1], 0.5)
        np.testing.assert_allclose(ap[1], 0.5)

    def test_voc_ap_perfect(self):
        rec = np.array([0.5, 1.0])
        prec = np.array([1.0, 1.0])
        assert voc_ap(rec, prec) == 1.0


class TestMergeOptimizationExact:
    def test_label_count_merge_matches_naive(self, rng):
        """The incremental-count IoU merge is bit-exact vs the naive
        scene-rescan formulation of the reference's block_merging loop."""
        from panopticsegforlargescalepointcloud_tpu.eval.merge import block_merging

        def naive(full_pos, tile_full_ids, tile_sub_ids, pre_sub, all_pre, max_i, th):
            from scipy.spatial import cKDTree

            all_pre = all_pre.copy()
            if not np.any(pre_sub != -1):
                return all_pre, max_i
            tree = cKDTree(full_pos[tile_sub_ids])
            _, nn = tree.query(full_pos[tile_full_ids], k=1)
            pre_ins = pre_sub[nn]
            tnum = int(pre_ins.max()) + 1
            labeled = all_pre[tile_full_ids] != -1
            if not labeled.any():
                mv = pre_ins != -1
                all_pre[tile_full_ids[mv]] = pre_ins[mv] + max_i
                return all_pre, max_i + tnum
            if labeled.all():
                return all_pre, max_i
            for ii in range(tnum):
                new_idx = tile_full_ids[pre_ins == ii]
                if new_idx.size == 0:
                    continue
                has_old = new_idx[all_pre[new_idx] != -1]
                not_old = new_idx[all_pre[new_idx] == -1]
                if has_old.size == 0:
                    all_pre[not_old] = max_i + 1
                    max_i += 1
                elif not_old.size == 0:
                    continue
                else:
                    best_iou, best_label = 0.0, 0
                    for g in np.unique(all_pre[has_old]):
                        old_all = np.where(all_pre == g)[0]
                        inter = np.intersect1d(old_all, new_idx).size
                        union = np.union1d(old_all, new_idx).size
                        iou = inter / max(union, 1)
                        if iou > best_iou:
                            best_iou, best_label = iou, g
                    if best_iou > th:
                        all_pre[not_old] = best_label
                    else:
                        all_pre[not_old] = max_i + 1
                        max_i += 1
            return all_pre, max_i

        n = 3000
        full_pos = rng.uniform(0, 20, (n, 3)).astype(np.float32)
        all_pre = -np.ones(n, np.int64)
        all_pre_naive = all_pre.copy()
        max_a = max_b = 0
        for _ in range(5):
            sub = np.sort(rng.choice(n, 400, replace=False)).astype(np.int64)
            tile = np.sort(rng.choice(n, 900, replace=False)).astype(np.int64)
            pre_sub = rng.integers(-1, 6, 400)
            a, max_a = block_merging(
                full_pos, tile, sub, pre_sub, all_pre, max_a, 0.05
            )
            b, max_b = naive(
                full_pos, tile, sub, pre_sub, all_pre_naive, max_b, 0.05
            )
            np.testing.assert_array_equal(a, b)
            assert max_a == max_b
            all_pre, all_pre_naive = a, b

    def test_block_merging_by_score(self, rng):
        from panopticsegforlargescalepointcloud_tpu.eval.merge import (
            block_merging_by_score,
        )

        n = 1000
        full_pos = rng.uniform(0, 10, (n, 3)).astype(np.float32)
        sub = np.arange(0, n, 2, dtype=np.int64)
        tile = np.arange(n, dtype=np.int64)
        clusters = [np.arange(0, 100), np.arange(5, 105), np.arange(200, 300)]
        scores = np.array([0.9, 0.5, 0.8])
        kept, ks = block_merging_by_score(
            [], None, clusters, scores, full_pos, tile, sub
        )
        # the 0.5-scoring near-duplicate of the 0.9 cluster is suppressed
        assert len(kept) == 2
        assert set(np.round(ks, 2)) == {0.9, 0.8}
