"""Loss parity tests against straight-line numpy implementations of the
reference formulas (panoptic_losses.py)."""

import jax.numpy as jnp
import numpy as np

from panopticsegforlargescalepointcloud_tpu.models.losses import (
    Proposals,
    discriminative_loss,
    instance_iou,
    instance_iou_loss,
    offset_loss,
    semantic_nll_loss,
)


def np_discriminative_single(pred, labels, dv=0.5, dd=1.5):
    uniq = np.unique(labels)
    mus = np.stack([pred[labels == u].mean(0) for u in uniq])
    # l_var
    l_var = 0.0
    for i, u in enumerate(uniq):
        d = np.abs(pred[labels == u] - mus[i]).sum(-1)
        l_var += (np.maximum(d - dv, 0) ** 2).sum() / (labels == u).sum()
    l_var /= len(uniq)
    # l_dist
    if len(uniq) > 1:
        diffs = []
        for i in range(len(uniq)):
            for j in range(len(uniq)):
                if i != j:
                    dn = np.abs(mus[i] - mus[j]).sum()
                    diffs.append(np.maximum(2 * dd - dn, 0) ** 2)
        l_dist = np.mean(diffs)
    else:
        l_dist = 0.0
    l_reg = np.abs(mus).sum(-1).mean()
    return l_var + l_dist + 0.001 * l_reg, l_var, l_dist, l_reg


class TestOffsetLoss:
    def test_matches_reference_formula(self, rng):
        n = 50
        pred = rng.normal(size=(n, 3)).astype(np.float32)
        gt = rng.normal(size=(n, 3)).astype(np.float32)
        mask = rng.random(n) > 0.3
        out = offset_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))
        total = mask.sum()
        norm_ref = np.abs(pred - gt).sum(-1)[mask].sum() / (total + 1e-6)
        gtu = gt / (np.linalg.norm(gt, axis=-1, keepdims=True) + 1e-8)
        pru = pred / (np.linalg.norm(pred, axis=-1, keepdims=True) + 1e-8)
        dir_ref = (-(gtu * pru).sum(-1))[mask].sum() / (total + 1e-6)
        np.testing.assert_allclose(float(out["offset_norm_loss"]), norm_ref, rtol=1e-5)
        np.testing.assert_allclose(float(out["offset_dir_loss"]), dir_ref, rtol=1e-4)


class TestSemanticLoss:
    def test_nll_with_ignore(self, rng):
        n, c = 40, 5
        logits = rng.normal(size=(n, c)).astype(np.float32)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        labels = rng.integers(-1, c, size=n).astype(np.int32)
        valid = np.ones(n, bool)
        valid[-5:] = False
        out = float(
            semantic_nll_loss(jnp.asarray(logp), jnp.asarray(labels), jnp.asarray(valid))
        )
        ok = valid & (labels >= 0)
        ref = (-logp[np.arange(n), np.maximum(labels, 0)])[ok].mean()
        np.testing.assert_allclose(out, ref, rtol=1e-5)


class TestDiscriminativeLoss:
    def test_matches_reference_per_sample(self, rng):
        b, k, e = 3, 8, 5
        ns = [30, 50, 1]
        embeds, labels, batches = [], [], []
        for s, n in enumerate(ns):
            embeds.append(rng.normal(size=(n, e)).astype(np.float32))
            labels.append(rng.integers(1, 5, size=n).astype(np.int32))
            batches.append(np.full(n, s, np.int32))
        embed = np.concatenate(embeds)
        lab = np.concatenate(labels)
        bat = np.concatenate(batches)
        # pad
        cap = 128
        pe = np.zeros((cap, e), np.float32)
        pl = np.zeros(cap, np.int32)
        pb = np.zeros(cap, np.int32)
        pm = np.zeros(cap, bool)
        n = len(embed)
        pe[:n], pl[:n], pb[:n], pm[:n] = embed, lab, bat, True

        out = discriminative_loss(
            jnp.asarray(pe), jnp.asarray(pl), jnp.asarray(pb), jnp.asarray(pm),
            num_samples=b, max_instances=k,
        )
        refs = [np_discriminative_single(e_, l_) for e_, l_ in zip(embeds, labels)]
        ref_loss = np.mean([r[0] for r in refs])
        ref_var = np.mean([r[1] for r in refs])
        ref_dist = np.mean([r[2] for r in refs])
        np.testing.assert_allclose(float(out["ins_loss"]), ref_loss, rtol=1e-4)
        np.testing.assert_allclose(float(out["ins_var_loss"]), ref_var, rtol=1e-4)
        np.testing.assert_allclose(float(out["ins_dist_loss"]), ref_dist, rtol=1e-4)

    def test_no_instances_gives_zero(self):
        cap = 16
        out = discriminative_loss(
            jnp.zeros((cap, 5)), jnp.zeros(cap, jnp.int32), jnp.zeros(cap, jnp.int32),
            jnp.zeros(cap, bool), num_samples=2, max_instances=4,
        )
        assert float(out["ins_loss"]) == 0.0


def build_proposals(clusters, cap_members, num_props, batch_of):
    """clusters: list of np arrays of point indices."""
    pi = np.full(cap_members, -1, np.int32)
    pid = np.full(cap_members, -1, np.int32)
    mv = np.zeros(cap_members, bool)
    pv = np.zeros(num_props, bool)
    pbat = np.full(num_props, -1, np.int32)
    ofs = 0
    for i, cl in enumerate(clusters):
        pi[ofs : ofs + len(cl)] = cl
        pid[ofs : ofs + len(cl)] = i
        mv[ofs : ofs + len(cl)] = True
        pv[i] = True
        pbat[i] = batch_of[cl[0]]
        ofs += len(cl)
    return Proposals(
        jnp.asarray(pi), jnp.asarray(pid), jnp.asarray(mv), jnp.asarray(pv),
        jnp.asarray(pbat), jnp.zeros(num_props, jnp.int32),
    )


class TestInstanceIoU:
    def test_iou_matrix(self, rng):
        n, b, k = 60, 2, 4
        batch = np.sort(rng.integers(0, b, size=n)).astype(np.int32)
        inst = rng.integers(0, 4, size=n).astype(np.int32)  # 0 = no instance
        clusters = [
            np.where((batch == 0))[0][:10],
            np.where((batch == 1))[0][:15],
            np.where(inst == 2)[0],
        ]
        props = build_proposals(clusters, 64, 8, batch)
        ious = np.asarray(
            instance_iou(props, jnp.asarray(inst), jnp.asarray(batch), b, k)
        )
        for p, cl in enumerate(clusters):
            for s in range(b):
                for lab in range(1, k + 1):
                    gt = set(np.where((batch == s) & (inst == lab))[0])
                    if not gt:
                        assert ious[p, s * k + lab - 1] == 0
                        continue
                    inter = len(gt & set(cl.tolist()))
                    union = len(gt) + len(cl) - inter
                    np.testing.assert_allclose(
                        ious[p, s * k + lab - 1], inter / union, rtol=1e-5,
                        err_msg=f"p={p} s={s} lab={lab}",
                    )
        assert np.all(ious[len(clusters):] == 0)

    def test_score_loss_ramp(self):
        ious = jnp.asarray([[0.1], [0.5], [0.9]], dtype=jnp.float32)
        scores = jnp.asarray([0.2, 0.5, 0.8], dtype=jnp.float32)
        valid = jnp.ones(3, bool)
        got = float(instance_iou_loss(ious, scores, valid))
        shat = np.array([0.0, 0.5, 1.0])
        s = np.array([0.2, 0.5, 0.8])
        ref = (-(shat * np.log(s) + (1 - shat) * np.log(1 - s))).mean()
        np.testing.assert_allclose(got, ref, rtol=1e-5)
