"""The mask-feature config flags must be LIVE: flipping each one changes
behavior, and their *_start_epoch gates switch it on only past the gate
(VERDICT r2 missing #1; reference PointGroup3heads.py:62-67,430,594 and
core/losses/panoptic_losses.py:25-90).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from panopticsegforlargescalepointcloud_tpu.data import collate_tiles, synthetic_tile
from panopticsegforlargescalepointcloud_tpu.models.losses import (
    Proposals,
    instance_iou,
)
from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
    PanopticConfig,
    PointGroup3HeadsNet,
)
from panopticsegforlargescalepointcloud_tpu.train.step import (
    batch_arrays,
    init_state,
    make_eval_forward,
    make_train_step,
    prepare_example,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def tiny_cfg(**kw):
    base = dict(
        num_classes=2, stuff_classes=(0,), backbone="tiny", feat_dim=4,
        in_feat=8, num_samples=1, max_instances=8, max_props_rg=16,
        ms_max_seeds=16, ms_max_clusters=4, ms_point_cap=512,
        cluster_radius=0.3, gemm_mode="fused",
    )
    base.update(kw)
    return PanopticConfig(**base)


def make_batch(rng, cfg, capacity=2048):
    t = synthetic_tile(
        rng, num_classes=cfg.num_classes, stuff_classes=cfg.stuff_classes,
        n_instances=6, pts_per_instance=120, n_ground=600, radius=6.0,
        grid_size=0.2,
    )
    vb = collate_tiles([t], capacity=capacity, num_tiles=1)
    return tuple(jnp.asarray(a) for a in batch_arrays(vb))


class TestMaskIoU:
    def test_member_pass_changes_iou(self):
        """member_pass excludes failing members from intersection AND
        proposal size, exactly like the reference's mask-gated IoU."""
        inst = jnp.asarray([1, 1, 1, 1, 2, 2, 0, 0], jnp.int32)
        batch = jnp.zeros(8, jnp.int32)
        # one proposal holding points 0..5 (4 of inst 1, 2 of inst 2)
        props = Proposals(
            point_idx=jnp.asarray([0, 1, 2, 3, 4, 5, -1, -1], jnp.int32),
            prop_id=jnp.asarray([0, 0, 0, 0, 0, 0, -1, -1], jnp.int32),
            member_valid=jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], bool),
            prop_valid=jnp.asarray([True]),
            prop_batch=jnp.asarray([0], jnp.int32),
            prop_type=jnp.asarray([0], jnp.int32),
        )
        plain = instance_iou(props, inst, batch, 1, 4)
        # IoU(prop, inst1) = 4 / (6 + 4 - 4) = 2/3
        np.testing.assert_allclose(float(plain[0, 0]), 4 / 6, atol=1e-6)
        # mask passes only the 4 points of inst 1 -> IoU = 4/4 = 1
        member_pass = jnp.asarray([1, 1, 1, 1, 0, 0, 1, 1], bool)
        gated = instance_iou(props, inst, batch, 1, 4, member_pass=member_pass)
        np.testing.assert_allclose(float(gated[0, 0]), 1.0, atol=1e-6)
        # and IoU against inst 2 collapses: 0 / (2 + 4 - 0)
        np.testing.assert_allclose(float(gated[0, 1]), 0.0, atol=1e-6)

    def test_cal_iou_flag_and_gate_change_loss(self):
        """Flipping cal_iou_based_on_mask changes score_loss (through
        panoptic_losses), and the start_epoch gate controls WHEN (epoch >
        gate only)."""
        from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
            PanopticOutput,
            panoptic_losses,
        )

        cfg = tiny_cfg(
            mask_supervise=True, cal_iou_based_on_mask=True,
            cal_iou_based_on_mask_start_epoch=50,
        )
        cfg_off = dataclasses.replace(cfg, cal_iou_based_on_mask=False)
        n = 8
        inst = jnp.asarray([1, 1, 1, 1, 2, 2, 0, 0], jnp.int32)
        batch = jnp.zeros(n, jnp.int32)
        valid = jnp.ones(n, bool)
        props = Proposals(
            point_idx=jnp.asarray([0, 1, 2, 3, 4, 5, -1, -1], jnp.int32),
            prop_id=jnp.asarray([0, 0, 0, 0, 0, 0, -1, -1], jnp.int32),
            member_valid=jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], bool),
            prop_valid=jnp.zeros((cfg.total_props,), bool).at[0].set(True),
            prop_batch=jnp.full((cfg.total_props,), -1, jnp.int32).at[0].set(0),
            prop_type=jnp.zeros((cfg.total_props,), jnp.int32),
        )
        # mask logits pass only inst-1 members -> mask-based IoU hits 1.0
        mask_scores = jnp.asarray([4.0, 4.0, 4.0, 4.0, -4.0, -4.0, 0, 0])
        out = PanopticOutput(
            semantic_logits=jnp.full((n, 2), jnp.log(0.5)),
            offset_logits=jnp.zeros((n, 3)),
            embed_logits=jnp.zeros((n, cfg.embed_dim)),
            backbone_feats=jnp.zeros((n, cfg.in_feat)),
            proposals=props,
            cluster_scores=jnp.full((cfg.total_props,), 0.9),
            mask_scores=mask_scores,
            mask_row_valid=jnp.ones(8, bool),
        )
        args = (out, jnp.zeros(n, jnp.int32), jnp.zeros((n, 3)), inst,
                inst > 0, batch, valid)

        def loss_of(c, epoch):
            _, m = jax.jit(
                lambda: panoptic_losses(c, *args, epoch=epoch)
            )()
            return float(m["score_loss"])

        base = loss_of(cfg_off, 60)
        gated_off = loss_of(cfg, 40)  # epoch <= start: same as off
        gated_on = loss_of(cfg, 60)  # epoch > start: mask-gated IoU
        assert gated_off == pytest.approx(base, rel=1e-6)
        # plain IoU = 4/6 -> shat ~ 0.83; mask-gated IoU = 1.0 -> shat = 1
        assert gated_on != pytest.approx(base, rel=1e-4)


class TestMaskFilterScoreFeature:
    def test_filter_flag_and_gate_change_scores(self, rng):
        """use_mask_filter_score_feature zeroes scorer features of members
        failing the mask gate - cluster scores must change, but only past
        use_mask_filter_score_feature_start_epoch."""
        cfg_off = tiny_cfg(
            mask_supervise=True, use_mask_filter_score_feature=False,
        )
        cfg_on = dataclasses.replace(
            cfg_off, use_mask_filter_score_feature=True,
            use_mask_filter_score_feature_start_epoch=50,
            mask_filter_score_feature_thre=0.99,  # bite hard at init
        )
        arrays = make_batch(rng, cfg_off)
        model_off = PointGroup3HeadsNet(cfg_off)
        model_on = PointGroup3HeadsNet(cfg_on)
        db, hier = prepare_example(arrays, cfg_off.num_down)
        state = init_state(
            cfg_off, model_off, optax.sgd(0.0), db, hier, jax.random.PRNGKey(0)
        )

        def scores_of(cfg, model, epoch):
            fwd = make_eval_forward(cfg, model, epoch=epoch)
            _, out = fwd(state.params, state.batch_stats, arrays)
            return np.asarray(out.cluster_scores)

        base = scores_of(cfg_off, model_off, 60)
        gated_off = scores_of(cfg_on, model_on, 40)
        gated_on = scores_of(cfg_on, model_on, 60)
        np.testing.assert_allclose(gated_off, base, atol=1e-6)
        assert not np.allclose(gated_on, base, atol=1e-6)
