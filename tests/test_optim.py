"""Config-driven optimizer/scheduler surface (reference base_model.py:299-355
+ conf/lr_scheduler/*): every scheduler class maps onto an optax schedule
with per-epoch semantics, grad accumulation reproduces the large-batch
update, and the trainer exposes the live lr in its metrics."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from panopticsegforlargescalepointcloud_tpu.config.schema import (
    training_config_from_yaml,
)
from panopticsegforlargescalepointcloud_tpu.train.optim import (
    build_from_config,
    make_lr_schedule,
    make_optimizer,
)


class TestSchedules:
    def test_exponential_matches_torch_semantics(self):
        s = make_lr_schedule("ExponentialLR", {"gamma": 0.9}, 1e-3, 10)
        assert np.isclose(float(s(0)), 1e-3)
        assert np.isclose(float(s(10)), 1e-3 * 0.9)  # after 1 epoch
        assert np.isclose(float(s(9)), 1e-3)  # staircase within the epoch

    def test_multistep(self):
        s = make_lr_schedule(
            "MultiStepLR", {"milestones": [2, 4], "gamma": 0.5}, 1.0, 5
        )
        assert np.isclose(float(s(5)), 1.0)
        assert np.isclose(float(s(10)), 0.5)
        assert np.isclose(float(s(20)), 0.25)

    def test_cosine_hits_eta_min(self):
        s = make_lr_schedule(
            "CosineAnnealingLR", {"T_max": 10, "eta_min": 1e-5}, 1e-3, 3
        )
        assert np.isclose(float(s(30)), 1e-5, rtol=1e-3)

    def test_poly_and_step(self):
        p = make_lr_schedule("PolyLR", {"power": 1.0, "max_epoch": 10}, 1.0, 1)
        assert np.isclose(float(p(5)), 0.5)
        st = make_lr_schedule("StepLR", {"step_size": 3, "gamma": 0.1}, 1.0, 2)
        assert np.isclose(float(st(6)), 0.1)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_lr_schedule("Mystery", {}, 1e-3, 1)


class TestGradAccum:
    def test_accumulation_matches_large_batch(self):
        """k mini-grads through MultiSteps == one step on their mean."""
        grads = [jnp.array([1.0, -2.0]), jnp.array([3.0, 0.5]),
                 jnp.array([-1.0, 1.5]), jnp.array([0.0, 4.0])]
        p0 = jnp.zeros(2)

        tx_acc = make_optimizer("SGD", 0.1, grad_accum=4)
        st = tx_acc.init(p0)
        p = p0
        for g in grads:
            up, st = tx_acc.update(g, st, p)
            p = optax.apply_updates(p, up)

        tx_big = make_optimizer("SGD", 0.1, grad_accum=1)
        stb = tx_big.init(p0)
        upb, _ = tx_big.update(sum(grads) / 4, stb, p0)
        pb = optax.apply_updates(p0, upb)
        np.testing.assert_allclose(np.asarray(p), np.asarray(pb), rtol=1e-6)

    def test_config_plumbing(self):
        cfg = {
            "training": {
                "optim": {"class": "AdamW", "base_lr": 2e-3, "weight_decay": 0.01},
                "grad_accum": 3,
            },
            "lr_scheduler": {"class": "CosineAnnealingLR", "params": {"T_max": 5}},
        }
        t = training_config_from_yaml(cfg)
        assert (t.optimizer, t.grad_accum, t.lr) == ("AdamW", 3, 2e-3)
        tx, sched, plateau = build_from_config(t, steps_per_epoch=4)
        assert np.isclose(float(sched(0)), 2e-3)
        p = {"w": jnp.ones(2)}
        assert tx.init(p) is not None


class TestTrainerLrTrace:
    def test_lr_in_metrics_follows_scheduler(self, tmp_path):
        from panopticsegforlargescalepointcloud_tpu.train.trainer import Trainer

        base = {
            "training": {"epochs": 2, "batch_size": 1, "samples_per_epoch": 2,
                         "optim": {"base_lr": 1e-2}},
            "models": {"PG": {"feat_size": 8, "cluster_type": 1, "prepare_epoch": 30}},
            "model_name": "PG",
            "data": {"class": "treeins"},
        }
        budgets = dict(max_instances=8, max_props_rg=8, ms_max_seeds=8,
                       ms_max_clusters=4, ms_point_cap=256)
        cfg = dict(base)
        cfg["lr_scheduler"] = {"class": "StepLR", "params": {"step_size": 1, "gamma": 0.1}}
        tr = Trainer(cfg, capacity=512, backbone="tiny", **budgets)
        m1 = tr._train_epoch(1, 2)  # 2 steps -> 1 full epoch
        m2 = tr._train_epoch(2, 2)
        assert np.isclose(m1["lr"], 1e-3)  # logged after epoch-1's 2 steps
        assert np.isclose(m2["lr"], 1e-4)


class TestCyclicAndPlateau:
    def test_cyclic_triangle(self):
        import jax.numpy as jnp

        from panopticsegforlargescalepointcloud_tpu.train.optim import (
            make_lr_schedule,
        )

        s = make_lr_schedule(
            "CyclicLR",
            {"base_lr": 0.01, "max_lr": 0.1, "step_size_up": 5},
            1e-3, 1,
        )
        lrs = [float(s(jnp.asarray(e))) for e in range(11)]
        assert lrs[0] == pytest.approx(0.01)
        assert lrs[5] == pytest.approx(0.1)  # peak after step_size_up epochs
        assert lrs[10] == pytest.approx(0.01)  # back to base
        assert lrs[2] < lrs[3] < lrs[4] < lrs[5] > lrs[6] > lrs[7]

    def test_plateau_controller_and_opt_state_scale(self):
        import dataclasses as dc

        import jax.numpy as jnp
        import numpy as np

        from panopticsegforlargescalepointcloud_tpu.config.schema import (
            TrainingConfig,
        )
        from panopticsegforlargescalepointcloud_tpu.train.optim import (
            apply_plateau_scale,
            build_from_config,
        )

        t = TrainingConfig(
            scheduler="ReduceLROnPlateau",
            scheduler_params={"mode": "min", "factor": 0.5, "patience": 1},
            lr=1.0, optimizer="SGD",
        )
        tx, sched, plateau = build_from_config(t, steps_per_epoch=1)
        assert plateau is not None
        # improving -> scale stays 1; then 2 bad epochs (> patience) -> 0.5
        assert plateau.step(1.0) == 1.0
        assert plateau.step(0.5) == 1.0
        assert plateau.step(0.6) == 1.0
        assert plateau.step(0.6) == 0.5

        params = {"w": jnp.ones((3,))}
        st = tx.init(params)
        st2 = apply_plateau_scale(st, plateau.scale)
        g = {"w": jnp.ones((3,))}
        up1, _ = tx.update(g, st, params)
        up2, _ = tx.update(g, st2, params)
        # sgd(lr=1) update = -1; plateau halves it
        np.testing.assert_allclose(np.asarray(up1["w"]), -1.0)
        np.testing.assert_allclose(np.asarray(up2["w"]), -0.5)

    def test_plateau_min_lr_is_absolute_floor(self):
        """torch ReduceLROnPlateau's min_lr is an ABSOLUTE lr floor; with
        base lr 1e-3 and min_lr 1e-5, the cumulative scale must floor at
        1e-2, not 1e-5 (code-review r3 fix)."""
        from panopticsegforlargescalepointcloud_tpu.train.optim import (
            PlateauController,
        )

        p = PlateauController(
            {"mode": "min", "factor": 0.1, "patience": 0, "min_lr": 1e-5},
            base_lr=1e-3,
        )
        p.step(1.0)  # first metric = best
        for _ in range(6):  # patience 0 -> decay every bad epoch
            p.step(2.0)
        import numpy as np

        # effective lr = base_lr * scale must not go below min_lr
        np.testing.assert_allclose(p.scale, 1e-2, rtol=1e-9)
        np.testing.assert_allclose(1e-3 * p.scale, 1e-5, rtol=1e-9)
