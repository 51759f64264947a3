"""End-to-end smoke tests: full train step (prepare and clustering phases)
on synthetic tiles with the tiny backbone - the reference's `early_break`
debugging pattern turned into CI (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from panopticsegforlargescalepointcloud_tpu.data import collate_tiles, synthetic_tile
from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
    PanopticConfig,
    PointGroup3HeadsNet,
)
from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy
from panopticsegforlargescalepointcloud_tpu.train.step import (
    batch_arrays,
    canonicalize,
    init_state,
    make_eval_forward,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    tiles = [synthetic_tile(rng, n_instances=4, pts_per_instance=80) for _ in range(2)]
    vb = collate_tiles(tiles, capacity=4096, num_tiles=2)
    cfg = PanopticConfig(
        num_classes=9,
        stuff_classes=(0, 7, 8),
        backbone="tiny",
        feat_dim=4,
        in_feat=8,
        num_samples=2,
        max_instances=16,
        max_props_rg=32,
        ms_max_seeds=64,
        ms_max_clusters=16,
        ms_point_cap=2048,
        cluster_radius=0.9,
        min_cluster_points=20,
    )
    model = PointGroup3HeadsNet(cfg)
    tx = optax.adam(1e-3)
    arrays = batch_arrays(vb)
    db = canonicalize(*arrays)
    hier = build_hierarchy(db.grid, cfg.num_down)
    state = init_state(cfg, model, tx, db, hier, jax.random.PRNGKey(0))
    return cfg, model, tx, arrays, state


def fresh(state):
    import jax.numpy as jnp
    return jax.tree.map(jnp.copy, state)


class TestTrainStep:
    def test_prepare_phase_decreases_loss(self, setup):
        cfg, model, tx, arrays, state = setup
        state = fresh(state)
        step = make_train_step(cfg, model, tx, with_clustering=False)
        losses = []
        for _ in range(5):
            state, metrics = step(state, arrays)
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0]
        assert float(metrics["hier_overflow"]) == 0

    def test_full_phase_runs_and_is_finite(self, setup):
        cfg, model, tx, arrays, state = setup
        state = fresh(state)
        step = make_train_step(cfg, model, tx, with_clustering=True)
        state2, metrics = step(state, arrays)
        for k, v in metrics.items():
            assert np.all(np.isfinite(np.asarray(v))), k
        assert "score_loss" in metrics

    def test_eval_forward(self, setup):
        cfg, model, tx, arrays, state = setup
        fwd = make_eval_forward(cfg, model, with_clustering=True)
        db, out = fwd(state.params, state.batch_stats, arrays)
        assert out.semantic_logits.shape[-1] == cfg.num_classes
        assert out.proposals is not None
        # log-softmax sanity on valid rows
        mask = np.asarray(db.grid.mask)
        probs = np.exp(np.asarray(out.semantic_logits))[mask]
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-3)
        # some proposals exist on this easy scene (random net but blobs are
        # spatially separated; region grow on raw pos should fire)
        assert out.cluster_scores.shape == (cfg.total_props,)
