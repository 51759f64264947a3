"""Coverage smoke tests across the paper's model settings: all cluster types,
scorer variants, and the mask-supervision head run a full train step with
finite losses (tiny shapes)."""

import jax
import numpy as np
import optax
import pytest

from panopticsegforlargescalepointcloud_tpu.data import collate_tiles, synthetic_tile
from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
    PanopticConfig,
    PointGroup3HeadsNet,
)
from panopticsegforlargescalepointcloud_tpu.train.step import (
    batch_arrays,
    init_state,
    make_train_step,
    prepare_example,
)


def tiny_cfg(**kw):
    base = dict(
        num_classes=9, stuff_classes=(0, 7, 8), backbone="tiny", feat_dim=4,
        in_feat=8, num_samples=1, max_instances=16, max_props_rg=16,
        ms_max_seeds=16, ms_max_clusters=8, ms_point_cap=512,
        cluster_radius=0.9, min_cluster_points=5,
    )
    base.update(kw)
    return PanopticConfig(**base)


def run_one_step(cfg, rng):
    model = PointGroup3HeadsNet(cfg)
    tiles = [synthetic_tile(rng, n_instances=2, pts_per_instance=40, n_ground=150)]
    vb = collate_tiles(tiles, capacity=1024, num_tiles=1)
    arrays = batch_arrays(vb)
    db, hier = prepare_example(arrays, cfg.num_down)
    tx = optax.adam(1e-3)
    state = init_state(cfg, model, tx, db, hier, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx, with_clustering=True)
    state, metrics = step(state, arrays)
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    return metrics


class TestClusterTypes:
    @pytest.mark.parametrize("ct", [1, 2, 3, 4, 6])
    def test_cluster_type_trains(self, rng, ct):
        metrics = run_one_step(tiny_cfg(cluster_type=ct), rng)
        assert "score_loss" in metrics


class TestScorerVariants:
    def test_mlp_scorer(self, rng):
        run_one_step(tiny_cfg(scorer_type="mlp"), rng)

    def test_encoder_scorer(self, rng):
        run_one_step(tiny_cfg(scorer_type="encoder"), rng)

    def test_semantic_certainty(self, rng):
        # Setting-I style: score net disabled entirely
        metrics = run_one_step(
            tiny_cfg(cluster_type=3, use_score_net=False, w_score=0.0), rng
        )
        assert "score_loss" not in metrics

    def test_no_scorer_type_uses_semantic_confidence(self, rng):
        metrics = run_one_step(tiny_cfg(scorer_type=""), rng)
        assert "score_loss" in metrics


class TestMaskHead:
    def test_mask_supervision(self, rng):
        metrics = run_one_step(
            tiny_cfg(mask_supervise=True, use_mask_filter_score_feature=True), rng
        )
        assert "mask_loss" in metrics


class TestBrickPath:
    def test_use_bricks_trains(self, rng):
        run_one_step(tiny_cfg(use_bricks=True), rng)
