"""PointGroupEmbed family (Setting I): no offset head, strategy-table
clustering (hdbscan / mean-shift / random-subset loops / region-grow),
reference pointgroupembed.py:106-190,219-790."""

import jax
import numpy as np
import optax
import pytest

from panopticsegforlargescalepointcloud_tpu.data import collate_tiles, synthetic_tile
from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
    EMBED_STRATEGIES,
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


def embed_cfg(**kw):
    base = dict(
        num_classes=9, stuff_classes=(0, 7, 8), backbone="tiny", feat_dim=4,
        in_feat=8, num_samples=1, max_instances=16, max_props_rg=16,
        ms_max_seeds=16, ms_max_clusters=8, ms_point_cap=256,
        hd_max_clusters=8, hd_point_cap=256, loop_max_clusters=4,
        hd_min_cluster_size=5, cluster_radius=0.9, min_cluster_points=5,
        model_family="embed", cluster_type=7,
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
    return state, metrics


class TestEmbedFamily:
    def test_no_offset_head_params(self, rng):
        cfg = embed_cfg()
        state, metrics = run_one_step(cfg, rng)
        names = jax.tree_util.tree_leaves_with_path(state.params)
        flat = ["/".join(str(p) for p in path) for path, _ in names]
        assert not any("offset" in f for f in flat)
        assert "offset_norm_loss" not in metrics

    def test_setting1_type7_no_scorenet(self, rng):
        """Setting I: pure mean-shift on embeddings, no score loss."""
        cfg = embed_cfg(cluster_type=7, use_score_net=False)
        _, metrics = run_one_step(cfg, rng)
        assert "score_loss" not in metrics
        assert "ins_loss" in metrics and "semantic_loss" in metrics

    @pytest.mark.parametrize("ct", [1, 8, 10])
    def test_strategy_types_train(self, rng, ct):
        _, metrics = run_one_step(embed_cfg(cluster_type=ct), rng)
        assert "score_loss" in metrics

    def test_eval_forward_produces_proposals(self, rng):
        cfg = embed_cfg(cluster_type=8)
        model = PointGroup3HeadsNet(cfg)
        tiles = [synthetic_tile(rng, n_instances=3, pts_per_instance=50, n_ground=150)]
        vb = collate_tiles(tiles, capacity=1024, num_tiles=1)
        arrays = batch_arrays(vb)
        db, hier = prepare_example(arrays, cfg.num_down)
        state = init_state(cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0))
        fwd = make_eval_forward(cfg, model, with_clustering=True)
        db2, out = fwd(state.params, state.batch_stats, arrays)
        assert out.proposals is not None
        assert int(np.sum(np.asarray(out.proposals.prop_valid))) >= 0
        assert np.asarray(out.offset_logits).max() == 0.0  # no offset head

    def test_budgets_match_strategy_table(self):
        for ct, ops in EMBED_STRATEGIES.items():
            cfg = embed_cfg(cluster_type=ct)
            total = 0
            for (method, _, loops, _, _) in ops:
                if method == "rg":
                    total += cfg.max_props_rg
                elif loops == 0:
                    per = cfg.hd_max_clusters if method == "hdbscan" else cfg.ms_max_clusters
                    total += cfg.num_samples * per
                else:
                    total += loops * cfg.num_samples * cfg.loop_max_clusters
            assert cfg.total_props == total, ct

    def test_pack_overflow_counted_once_per_cap(self, rng):
        """Strategies sharing one point-cap pack must not re-count its drops:
        the cluster_overflow metric sizes the caps (code-review r3 fix)."""
        import jax.numpy as jnp

        from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
            build_proposals,
        )

        # cluster_type 1 = two hdbscan ops, both drawing from the same
        # hd_point_cap pack
        cap = 64
        cfg = embed_cfg(cluster_type=1, hd_point_cap=cap)
        n = 256
        pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        embeds = jnp.asarray(rng.normal(size=(n, cfg.embed_dim)), jnp.float32)
        batch = jnp.zeros((n,), jnp.int32)
        valid = jnp.ones((n,), bool)
        # force every valid row to a thing class (class 1)
        sem_logp = jnp.tile(
            jnp.log(jnp.eye(cfg.num_classes)[1] * 0.9 + 0.01), (n, 1)
        )
        _, overflow, _ = build_proposals(
            cfg, pos, jnp.zeros((n, 3)), embeds, sem_logp, batch, valid
        )
        # 256 thing rows, cap 64 -> exactly 192 dropped, counted ONCE even
        # though two strategies consume the pack
        assert int(overflow) == n - cap

    def test_eval_subset_seed_varies_proposals(self, rng):
        """Different subset_seed counters must resample the random feature
        subsets per forward (reference torch.multinomial per forward,
        hdbscan_cluster.py:28-34); the evaluator passes a per-(vote, tile)
        counter (code-review r3 fix)."""
        cfg = embed_cfg(cluster_type=2)  # has a loops>0 random-subset op
        model = PointGroup3HeadsNet(cfg)
        tiles = [synthetic_tile(rng, n_instances=3, pts_per_instance=60,
                                n_ground=100)]
        vb = collate_tiles(tiles, capacity=1024, num_tiles=1)
        arrays = batch_arrays(vb)
        db, hier = prepare_example(arrays, cfg.num_down)
        state = init_state(cfg, model, optax.adam(1e-3), db, hier,
                           jax.random.PRNGKey(0))
        fwd = make_eval_forward(cfg, model, with_clustering=True)
        outs = []
        for seed in (0, 1):
            _, out = fwd(state.params, state.batch_stats, arrays,
                         subset_seed=seed)
            outs.append(np.asarray(out.proposals.prop_id))
        assert not np.array_equal(outs[0], outs[1]), (
            "proposals identical across subset_seed values - the per-forward "
            "random subsets are not resampling"
        )
        # same seed twice -> reproducible
        _, out = fwd(state.params, state.batch_stats, arrays, subset_seed=0)
        np.testing.assert_array_equal(outs[0], np.asarray(out.proposals.prop_id))
