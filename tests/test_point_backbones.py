"""Point-backbone families (KPConv / PointNet++) + the cross-set radius query.

Covers: radius_query vs a brute-force oracle, KPConvLayer vs a numpy oracle
of the reference kernel-correlation math (convolution_ops.py:19-110),
backbone forwards (shapes / finiteness / padding hygiene / translation
invariance), and full train steps through the panoptic pipeline for both
families (reference KPConvPaper / PointNet2_D semantics: 3 heads, no scorer,
cluster_type 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from panopticsegforlargescalepointcloud_tpu.cluster.neighbors import radius_query
from panopticsegforlargescalepointcloud_tpu.data import collate_tiles, synthetic_tile
from panopticsegforlargescalepointcloud_tpu.models.point_backbones import (
    KPConvBackbone,
    KPConvLayer,
    PointNet2Backbone,
    kernel_dispositions,
    level_positions,
)
from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
    PanopticConfig,
    PointGroup3HeadsNet,
)
from panopticsegforlargescalepointcloud_tpu.train.step import (
    batch_arrays,
    init_state,
    make_train_step,
    panoptic_forward,
    prepare_example,
)


def point_cfg(backbone, **kw):
    base = dict(
        num_classes=9, stuff_classes=(0, 7, 8), backbone=backbone, feat_dim=4,
        in_feat=8, num_samples=1, max_instances=16, max_props_rg=16,
        ms_max_seeds=16, ms_max_clusters=8, ms_point_cap=512,
        cluster_radius=0.9, min_cluster_points=5, use_score_net=False,
        cluster_type=5, w_score=0.0, grid_size=0.2, point_levels=2,
        kp_base_channels=8, pn2_base_channels=8,
        # tests assert exact translation invariance, which only holds while
        # the per-cell candidate budget does not bind (see point_cell_cap)
        point_cell_cap=64,
    )
    base.update(kw)
    return PanopticConfig(**base)


def make_db(rng, cfg, n_instances=2):
    tiles = [
        synthetic_tile(rng, n_instances=n_instances, pts_per_instance=40, n_ground=150)
    ]
    vb = collate_tiles(tiles, capacity=1024, num_tiles=1)
    arrays = batch_arrays(vb)
    db, hier = prepare_example(arrays, cfg.num_down)
    return arrays, db, hier


class TestRadiusQuery:
    def test_matches_bruteforce(self, rng):
        nq, ns, r = 120, 200, 0.7
        q = rng.uniform(-3, 3, size=(nq, 3)).astype(np.float32)
        s = rng.uniform(-3, 3, size=(ns, 3)).astype(np.float32)
        qb = rng.integers(0, 2, nq).astype(np.int32)
        sb = rng.integers(0, 2, ns).astype(np.int32)
        qv = rng.random(nq) > 0.1
        sv = rng.random(ns) > 0.1
        idx, d2 = radius_query(
            jnp.asarray(q), jnp.asarray(qb), jnp.asarray(qv),
            jnp.asarray(s), jnp.asarray(sb), jnp.asarray(sv),
            radius=r, k=64, cell_cap=64,
        )
        idx = np.asarray(idx)
        d2 = np.asarray(d2)
        dd = np.sum((q[:, None, :] - s[None, :, :]) ** 2, axis=-1)
        ok = (dd <= r * r) & (qb[:, None] == sb[None, :]) & qv[:, None] & sv[None, :]
        for i in range(nq):
            expected = set(np.nonzero(ok[i])[0].tolist())
            got = set(int(j) for j in idx[i] if j >= 0)
            assert got == expected, f"query {i}"
            # nearest-first ordering
            valid_d = d2[i][idx[i] >= 0]
            assert np.all(np.diff(valid_d) >= -1e-6)

    def test_k_truncation_keeps_nearest(self, rng):
        s = rng.uniform(-0.2, 0.2, size=(50, 3)).astype(np.float32)
        q = np.zeros((1, 3), np.float32)
        z = np.zeros(1, np.int32)
        idx, d2 = radius_query(
            jnp.asarray(q), jnp.asarray(z), jnp.ones(1, bool),
            jnp.asarray(s), jnp.zeros(50, jnp.int32), jnp.ones(50, bool),
            radius=1.0, k=5, cell_cap=64,
        )
        dd = np.sort(np.sum(s * s, axis=1))
        np.testing.assert_allclose(np.sort(np.asarray(d2[0])), dd[:5], rtol=1e-5)


class TestKernelDispositions:
    def test_layout(self):
        kp = kernel_dispositions(15)
        assert kp.shape == (15, 3)
        np.testing.assert_allclose(kp[0], 0.0, atol=1e-7)
        r = np.linalg.norm(kp[1:], axis=1)
        assert np.all(r <= 1.01)
        assert np.all(r >= 0.3)  # repulsion spreads points away from center
        # deterministic (cached + seeded)
        np.testing.assert_array_equal(kp, kernel_dispositions(15))


class TestKPConvLayer:
    def test_matches_numpy_oracle(self, rng):
        q, s, m, cin, cout, p = 7, 11, 4, 3, 5, 15
        extent = 0.8
        q_pos = rng.normal(size=(q, 3)).astype(np.float32)
        s_pos = rng.normal(size=(s, 3)).astype(np.float32)
        feats = rng.normal(size=(s, cin)).astype(np.float32)
        nbr = rng.integers(-1, s, size=(q, m)).astype(np.int32)
        layer = KPConvLayer(features=cout, extent=extent)
        vars_ = layer.init(
            jax.random.PRNGKey(0), jnp.asarray(q_pos), jnp.asarray(s_pos),
            jnp.asarray(feats), jnp.asarray(nbr),
        )
        out = np.asarray(
            layer.apply(vars_, jnp.asarray(q_pos), jnp.asarray(s_pos),
                        jnp.asarray(feats), jnp.asarray(nbr))
        )
        w = np.asarray(vars_["params"]["kernel"])
        kp = kernel_dispositions(p) * (1.5 * extent)
        expected = np.zeros((q, cout), np.float32)
        for i in range(q):
            for j in range(m):
                if nbr[i, j] < 0:
                    continue
                rel = s_pos[nbr[i, j]] - q_pos[i]
                d = np.linalg.norm(rel[None, :] - kp, axis=1)  # [P]
                infl = np.maximum(0.0, 1.0 - d / extent)
                for pk in range(p):
                    expected[i] += infl[pk] * feats[nbr[i, j]] @ w[pk]
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


class TestKPConvDeformableLayer:
    def _setup(self, rng, modulated, loss_mode="fitting"):
        from panopticsegforlargescalepointcloud_tpu.models.point_backbones import (
            KPConvDeformableLayer,
        )

        q, s, m, cin, cout, p = 7, 11, 4, 3, 5, 15
        extent = 0.8
        q_pos = rng.normal(size=(q, 3)).astype(np.float32)
        s_pos = rng.normal(size=(s, 3)).astype(np.float32)
        feats = rng.normal(size=(s, cin)).astype(np.float32)
        nbr = rng.integers(-1, s, size=(q, m)).astype(np.int32)
        qm = np.ones(q, bool)
        layer = KPConvDeformableLayer(
            features=cout, extent=extent, modulated=modulated,
            loss_mode=loss_mode,
        )
        args = (jnp.asarray(q_pos), jnp.asarray(s_pos), jnp.asarray(feats),
                jnp.asarray(nbr), jnp.asarray(qm))
        vars_ = layer.init(jax.random.PRNGKey(0), *args)
        # drop the init-run's sown values: apply must start a fresh collection
        out, sown = layer.apply(
            {"params": vars_["params"]}, *args, mutable=["kp_losses"]
        )
        return (layer, vars_, out, sown, q_pos, s_pos, feats, nbr, extent,
                cout, p)

    @pytest.mark.parametrize("modulated", [False, True])
    def test_matches_numpy_oracle(self, rng, modulated):
        """Deformable conv vs a numpy transcription of the reference
        KPConv_deform_ops (convolution_ops.py:110-194): rigid pass predicts
        offsets (+ 2*sigmoid modulations), main pass correlates against the
        deformed kernel points."""
        (layer, vars_, out, _, q_pos, s_pos, feats, nbr, extent, cout, p
         ) = self._setup(rng, modulated)
        params = vars_["params"]
        kp = kernel_dispositions(p) * (1.5 * extent)
        w_off = np.asarray(params["offset_kernel"])
        b_off = np.asarray(params["offset_bias"])
        w = np.asarray(params["kernel"])
        q = q_pos.shape[0]

        def rigid(i, weights, dim):
            acc = np.zeros(dim, np.float64)
            for j in nbr[i]:
                if j < 0:
                    continue
                rel = s_pos[j] - q_pos[i]
                d = np.linalg.norm(rel[None] - kp, axis=1)
                infl = np.maximum(0.0, 1.0 - d / extent)
                for pk in range(p):
                    acc += infl[pk] * feats[j] @ weights[pk]
            return acc

        expected = np.zeros((q, cout), np.float64)
        for i in range(q):
            off_feat = rigid(i, w_off, w_off.shape[2]) + b_off
            offsets = off_feat[: 3 * p].reshape(p, 3) * extent
            modul = (2.0 / (1.0 + np.exp(-off_feat[3 * p:]))
                     if modulated else np.ones(p))
            deformed = kp + offsets
            for j in nbr[i]:
                if j < 0:
                    continue
                rel = s_pos[j] - q_pos[i]
                d = np.linalg.norm(rel[None] - deformed, axis=1)
                infl = np.maximum(0.0, 1.0 - d / extent) * modul
                for pk in range(p):
                    expected[i] += infl[pk] * feats[j] @ w[pk]
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-3, atol=2e-3)

    def test_fitting_and_repulsion_losses(self, rng):
        """fitting = masked mean over (q, p) of min-neighbor sq distance /
        kernel_radius^2 (losses.py:4-14); repulsion penalizes deformed points
        closer than 1.5 extents (losses.py:17-33, normalization fixed)."""
        (layer, vars_, out, sown, q_pos, s_pos, feats, nbr, extent, cout, p
         ) = self._setup(rng, False)
        kl = jax.tree_util.tree_leaves(sown["kp_losses"])
        assert len(kl) == 2
        losses = sown["kp_losses"]
        fit = float(losses["fitting"][0])
        rep = float(losses["repulsion"][0])
        assert np.isfinite(fit) and fit >= 0
        assert np.isfinite(rep) and rep >= 0
        # fitting must reflect distances to the DEFORMED points: recompute
        # from the oracle pieces
        params = vars_["params"]
        kp = kernel_dispositions(p) * (1.5 * extent)
        w_off = np.asarray(params["offset_kernel"])
        b_off = np.asarray(params["offset_bias"])
        q = q_pos.shape[0]
        tot, cnt = 0.0, 0
        for i in range(q):
            acc = np.zeros(w_off.shape[2], np.float64)
            for j in nbr[i]:
                if j < 0:
                    continue
                rel = s_pos[j] - q_pos[i]
                d = np.linalg.norm(rel[None] - kp, axis=1)
                infl = np.maximum(0.0, 1.0 - d / extent)
                for pk in range(p):
                    acc += infl[pk] * feats[j] @ w_off[pk]
            off = (acc + b_off).reshape(p, 3) * extent
            deformed = kp + off
            valid = nbr[i] >= 0
            if not valid.any():
                continue
            rels = s_pos[nbr[i][valid]] - q_pos[i]
            sq = np.sum((rels[:, None, :] - deformed[None]) ** 2, axis=-1)
            tot += np.sum(sq.min(axis=0))
            cnt += p
        expect_fit = tot / (cnt * (1.5 * extent) ** 2)
        np.testing.assert_allclose(fit, expect_fit, rtol=2e-3)

    def test_permissive_loss_mode(self, rng):
        (_, _, _, sown, *_rest) = self._setup(rng, False, loss_mode="permissive")
        losses = sown["kp_losses"]
        assert set(losses) == {"permissive"}
        assert np.isfinite(float(losses["permissive"][0]))

    def test_offsets_receive_gradient(self, rng):
        """The offset-predicting weights must sit on the gradient path of
        both the output and the regularizers."""
        from panopticsegforlargescalepointcloud_tpu.models.point_backbones import (
            KPConvDeformableLayer,
        )

        q, s, m, cin = 16, 32, 6, 3
        q_pos = jnp.asarray(rng.normal(size=(q, 3)), jnp.float32)
        s_pos = jnp.asarray(rng.normal(size=(s, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(s, cin)), jnp.float32)
        nbr = jnp.asarray(rng.integers(0, s, size=(q, m)), jnp.int32)
        qm = jnp.ones(q, bool)
        layer = KPConvDeformableLayer(features=4, extent=0.8)
        vars_ = layer.init(jax.random.PRNGKey(1), q_pos, s_pos, feats, nbr, qm)

        def loss(params):
            out, sown = layer.apply(
                {"params": params}, q_pos, s_pos, feats, nbr, qm,
                mutable=["kp_losses"],
            )
            reg = sum(v[0] for v in sown["kp_losses"].values())
            return jnp.sum(out**2) + reg

        g = jax.grad(loss)(vars_["params"])
        assert float(jnp.abs(g["offset_kernel"]).max()) > 0
        assert float(jnp.abs(g["offset_bias"]).max()) > 0


class TestBackboneForward:
    @pytest.mark.parametrize("backbone", ["kpconv", "pointnet2"])
    def test_shapes_padding_and_translation_invariance(self, rng, backbone):
        cfg = point_cfg(backbone)
        arrays, db, hier = make_db(rng, cfg)
        model = PointGroup3HeadsNet(cfg)
        tx = optax.adam(1e-3)
        state = init_state(cfg, model, tx, db, hier, jax.random.PRNGKey(0))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out, _ = panoptic_forward(
            cfg, model, variables, db, hier, train=False, with_clustering=False
        )
        n = db.pos.shape[0]
        assert out.semantic_logits.shape == (n, cfg.num_classes)
        assert out.backbone_feats.shape == (n, cfg.in_feat)
        assert np.all(np.isfinite(np.asarray(out.backbone_feats)))
        # padding rows carry zero backbone features
        pad = ~np.asarray(db.grid.mask)
        assert pad.any()
        np.testing.assert_allclose(
            np.asarray(out.backbone_feats)[pad], 0.0, atol=1e-6
        )
        # rigid translation of every position leaves features unchanged
        db2 = db._replace(pos=db.pos + jnp.asarray([13.0, -7.0, 3.0]))
        out2, _ = panoptic_forward(
            cfg, model, variables, db2, hier, train=False, with_clustering=False
        )
        np.testing.assert_allclose(
            np.asarray(out.backbone_feats), np.asarray(out2.backbone_feats),
            rtol=2e-3, atol=2e-3,
        )

    def test_level_positions_are_barycenters(self, rng):
        cfg = point_cfg("kpconv")
        _, db, hier = make_db(rng, cfg)
        ps, masks = level_positions(db.pos, hier)
        assert len(ps) == cfg.num_down + 1
        parent = np.asarray(hier.parents[0])
        fine_mask = np.asarray(hier.grids[0].mask)
        pos0 = np.asarray(db.pos)
        p1 = np.asarray(ps[1])
        # pick a coarse row with children and check the mean
        counts = np.bincount(
            parent[fine_mask & (parent >= 0)], minlength=p1.shape[0]
        )
        c = int(np.argmax(counts))
        sel = fine_mask & (parent == c)
        np.testing.assert_allclose(p1[c], pos0[sel].mean(axis=0), rtol=1e-4, atol=1e-4)


class TestPointBackboneTraining:
    @pytest.mark.parametrize("backbone", ["kpconv", "pointnet2"])
    def test_full_train_step(self, rng, backbone):
        cfg = point_cfg(backbone)
        arrays, db, hier = make_db(rng, cfg)
        model = PointGroup3HeadsNet(cfg)
        tx = optax.adam(1e-3)
        state = init_state(cfg, model, tx, db, hier, jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx, with_clustering=True)
        state, metrics = step(state, arrays)
        for k in ("semantic_loss", "offset_norm_loss", "ins_loss"):
            assert k in metrics, k
            assert np.isfinite(float(metrics[k])), k
        assert "score_loss" not in metrics  # KPConvPaper has no ScoreNet
        # params actually moved
        l0 = float(metrics["loss"])
        state, metrics2 = step(state, arrays)
        assert np.isfinite(float(metrics2["loss"]))

    def test_deformable_train_step_collects_internal_losses(self, rng):
        """kp_deformable=True end to end: the sown fitting/repulsion
        regularizers reach the metrics, are summed across the deformable
        blocks, and are lambda-weighted into the total (reference
        collect_internal_losses, base_model.py:389-402)."""
        cfg = point_cfg("kpconv", kp_deformable=True,
                        lambda_internal_losses=0.1)
        arrays, db, hier = make_db(rng, cfg)
        model = PointGroup3HeadsNet(cfg)
        tx = optax.adam(1e-3)
        state = init_state(cfg, model, tx, db, hier, jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx, with_clustering=False)
        state, metrics = step(state, arrays)
        for k in ("fitting_loss", "repulsion_loss"):
            assert k in metrics, metrics.keys()
            assert np.isfinite(float(metrics[k])), k
        assert float(metrics["fitting_loss"]) > 0
        # the regularizers participate in the total
        base = sum(
            w * float(metrics[k]) for k, w in [
                ("semantic_loss", cfg.w_semantic),
                ("offset_norm_loss", cfg.w_offset_norm),
                ("offset_dir_loss", cfg.w_offset_dir),
                ("ins_loss", cfg.w_embed),
            ]
        )
        reg = cfg.lambda_internal_losses * (
            float(metrics["fitting_loss"]) + float(metrics["repulsion_loss"])
        )
        np.testing.assert_allclose(float(metrics["loss"]), base + reg, rtol=1e-4)
