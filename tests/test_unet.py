"""Backbone tests: shapes, masking discipline, gradient flow, jit."""

import jax
import jax.numpy as jnp
import numpy as np

from panopticsegforlargescalepointcloud_tpu.models import (
    MaskedBatchNorm,
    SparseEncoder,
    SparseUNet,
    paper_backbone_plan,
    scorer_encoder_plan,
    scorer_unet_plan,
)
from panopticsegforlargescalepointcloud_tpu.ops import make_grid
from panopticsegforlargescalepointcloud_tpu.ops.hierarchy import build_hierarchy


def toy_batch(rng, n=400, cap=512, batch_size=2, extent=24, feat=4):
    coords = rng.integers(-extent, extent, size=(n, 3)).astype(np.int32)
    batch = rng.integers(0, batch_size, size=(n,)).astype(np.int32)
    key = np.unique(
        np.concatenate([batch[:, None], coords], axis=1), axis=0
    )
    batch, coords = key[:, 0].astype(np.int32), key[:, 1:].astype(np.int32)
    n = len(batch)
    pb = np.zeros(cap, np.int32)
    pc = np.zeros((cap, 3), np.int32)
    pm = np.zeros(cap, bool)
    pb[:n], pc[:n], pm[:n] = batch, coords, True
    feats = np.zeros((cap, feat), np.float32)
    feats[:n] = rng.normal(size=(n, feat))
    return (
        jnp.asarray(pb),
        jnp.asarray(pc),
        jnp.asarray(pm),
        jnp.asarray(feats),
    )


class TestMaskedBatchNorm:
    def test_stats_ignore_padding(self, rng):
        x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
        mask = jnp.asarray(np.arange(64) < 40)
        bn = MaskedBatchNorm()
        vars0 = bn.init(jax.random.PRNGKey(0), x, mask, True)
        y, new_vars = bn.apply(vars0, x, mask, True, 0.5, mutable=["batch_stats"])
        xv = np.asarray(x)[:40]
        np.testing.assert_allclose(
            np.asarray(y)[:40].mean(0), np.zeros(8), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(y)[40:], 0.0)
        # running stats updated toward batch stats with torch momentum 0.5
        got_mean = np.asarray(new_vars["batch_stats"]["MaskedBatchNorm_0"]["mean"]
                              if "MaskedBatchNorm_0" in new_vars["batch_stats"]
                              else new_vars["batch_stats"]["mean"])
        np.testing.assert_allclose(got_mean, 0.5 * xv.mean(0), rtol=1e-5, atol=1e-6)

    def test_packed_train_matches_unpacked(self, rng):
        """Packed-layout BN train branch (per-lane mask expansion, fold() of
        lane sums into channel stats, pad-lane handling) must match the plain
        [N, C] path bit-for-bit in outputs AND batch_stats updates (advisor
        r4: the UNet win-vs-rows parity test only covered train=False).

        c=16 packs 8 voxels/row with no pad lanes; c=24 packs 4 voxels/row
        into 96 live lanes + 32 pad lanes (_lanes_pad rounds to 128)."""
        from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
            Packed,
            pack_feats,
            unpack_feats,
        )

        for c in (16, 24):
            n = 128
            x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32) * 2 + 0.3)
            mask = jnp.asarray(rng.random(n) < 0.7)
            xm = jnp.where(mask[:, None], x, 0.0)  # pad rows zero, like convs emit
            xp = pack_feats(xm)
            assert isinstance(xp, Packed)
            if c == 24:
                assert xp.data.shape[1] > xp.p * c  # pad lanes present
            bn = MaskedBatchNorm()
            vars0 = bn.init(jax.random.PRNGKey(0), xm, mask, True)
            y_u, nv_u = bn.apply(vars0, xm, mask, True, 0.3, mutable=["batch_stats"])
            y_p, nv_p = bn.apply(vars0, xp, mask, True, 0.3, mutable=["batch_stats"])
            assert isinstance(y_p, Packed)
            np.testing.assert_allclose(
                np.asarray(unpack_feats(y_p)), np.asarray(y_u), rtol=1e-5, atol=1e-6
            )
            # pad lanes stay zero (the lane mask must drop them)
            if xp.data.shape[1] != xp.p * c:
                np.testing.assert_allclose(
                    np.asarray(y_p.data[:, xp.p * c:]), 0.0
                )
            for k in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(nv_p["batch_stats"][k]),
                    np.asarray(nv_u["batch_stats"][k]),
                    rtol=1e-5, atol=1e-6,
                )

    def test_eval_uses_running_stats(self, rng):
        x = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32) * 3 + 1)
        mask = jnp.ones(32, bool)
        bn = MaskedBatchNorm()
        vars0 = bn.init(jax.random.PRNGKey(0), x, mask, True)
        y = bn.apply(vars0, x, mask, False)
        # running stats are (0, 1) at init -> eval output == input
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5)


class TestUNet:
    def test_paper_unet_shapes_and_grads(self, rng):
        pb, pc, pm, feats = toy_batch(rng)
        grid, _ = make_grid(pb, pc, pm)
        plan = paper_backbone_plan(feat=4, in_feat=8)
        hier = build_hierarchy(grid, num_down=6)
        model = SparseUNet(**plan)
        variables = model.init(jax.random.PRNGKey(0), feats, hier, False)
        out = model.apply(variables, feats, hier, False)
        assert out.shape == (feats.shape[0], 8)
        # padding rows must stay zero
        np.testing.assert_allclose(
            np.asarray(out)[~np.asarray(pm)], 0.0, atol=1e-6
        )

        def loss_fn(params):
            y, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, hier, True, mutable=["batch_stats"],
            )
            return jnp.sum(y ** 2)

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0

    def test_scorer_unet_and_encoder(self, rng):
        pb, pc, pm, feats = toy_batch(rng, feat=16)
        grid, _ = make_grid(pb, pc, pm)
        hier = build_hierarchy(grid, num_down=2)
        unet = SparseUNet(**scorer_unet_plan(in_feat=16))
        v = unet.init(jax.random.PRNGKey(0), feats, hier, False)
        out = unet.apply(v, feats, hier, False)
        assert out.shape == (feats.shape[0], 16)

        enc = SparseEncoder(**scorer_encoder_plan(in_feat=16), num_segments=4)
        v2 = enc.init(jax.random.PRNGKey(0), feats, hier, False)
        out2 = enc.apply(v2, feats, hier, False)
        assert out2.shape == (4, 16)

    def test_jit_compiles_once(self, rng):
        pb, pc, pm, feats = toy_batch(rng, n=200, cap=256)
        plan = paper_backbone_plan(feat=4, in_feat=4)
        model = SparseUNet(**plan)

        @jax.jit
        def fwd(variables, pb, pc, pm, feats):
            grid, _ = make_grid(pb, pc, pm)
            hier = build_hierarchy(grid, num_down=6)
            return model.apply(variables, feats, hier, False)

        grid, _ = make_grid(pb, pc, pm)
        hier = build_hierarchy(grid, num_down=6)
        variables = model.init(jax.random.PRNGKey(0), feats, hier, False)
        out = fwd(variables, pb, pc, pm, feats)
        assert out.shape == (256, 4)
