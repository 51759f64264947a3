"""Torch-checkpoint importer plumbing test: emit a reference-style state_dict
from our own params (inverse mapping), convert it back, and require an exact
round trip for the backbone/scorer/head subtrees."""

import sys
import os.path as osp

import jax
import numpy as np
import optax
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))

from import_torch_checkpoint import convert_state_dict  # noqa: E402

from panopticsegforlargescalepointcloud_tpu.data import (  # noqa: E402
    collate_tiles,
    synthetic_tile,
)
from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (  # noqa: E402
    PanopticConfig,
    PointGroup3HeadsNet,
)
from panopticsegforlargescalepointcloud_tpu.train.step import (  # noqa: E402
    batch_arrays,
    init_state,
    prepare_example,
)


def emit_reference_sd(params, stats, n_down, n_up, n_res, s_down, s_up,
                      scorer_n_res=2):
    """Inverse of convert_state_dict: our pytree -> torch-points3d key names."""
    sd = {}

    def put_bn(prefix, p, s, fast=False):
        stem = prefix + (".batch_norm" if fast else ".bn")
        sd[stem + ".weight"] = np.asarray(p["scale"])
        sd[stem + ".bias"] = np.asarray(p["bias"])
        sd[stem + ".running_mean"] = np.asarray(s["mean"])
        sd[stem + ".running_var"] = np.asarray(s["var"])

    def put_resnet(tp, p, s, reverse, blocks=None):
        k = np.asarray(p["ConvBNReLU_0"]["SparseConv_0"]["kernel"])
        sd[f"{tp}.conv_in.0.kernel"] = k[::-1].copy() if reverse else k
        put_bn(f"{tp}.conv_in.1", p["ConvBNReLU_0"]["MaskedBatchNorm_0"],
               s["ConvBNReLU_0"]["MaskedBatchNorm_0"])
        for b in range(blocks if blocks is not None else n_res):
            bp, bs = p[f"ResBlock_{b}"], s[f"ResBlock_{b}"]
            for j, ci, bi in ((0, 0, 1), (1, 3, 4)):
                kk = np.asarray(bp[f"ConvBNReLU_{j}"]["SparseConv_0"]["kernel"])
                sd[f"{tp}.blocks.{b}.block.{ci}.kernel"] = (
                    kk[::-1].copy() if reverse else kk
                )
                put_bn(f"{tp}.blocks.{b}.block.{bi}",
                       bp[f"ConvBNReLU_{j}"]["MaskedBatchNorm_0"],
                       bs[f"ConvBNReLU_{j}"]["MaskedBatchNorm_0"])
            if "Dense_0" in bp:
                sd[f"{tp}.blocks.{b}.downsample.0.kernel"] = np.asarray(
                    bp["Dense_0"]["kernel"]
                )
                put_bn(f"{tp}.blocks.{b}.downsample.1",
                       bp["MaskedBatchNorm_0"], bs["MaskedBatchNorm_0"])

    for i in range(n_down):
        put_resnet(f"Backbone.model.down_modules.{i}",
                   params["backbone"][f"down_{i}"], stats["backbone"][f"down_{i}"],
                   reverse=False)
    for i in range(n_up):
        put_resnet(f"Backbone.model.up_modules.{i}",
                   params["backbone"][f"up_{i}"]["up"],
                   stats["backbone"][f"up_{i}"]["up"], reverse=True)
    for i in range(s_down):
        put_resnet(f"ScorerUnet.model.down_modules.{i}",
                   params["scorer"][f"down_{i}"], stats["scorer"][f"down_{i}"],
                   reverse=False, blocks=scorer_n_res)
    for i in range(s_up):
        put_resnet(f"ScorerUnet.model.up_modules.{i}",
                   params["scorer"][f"up_{i}"]["up"],
                   stats["scorer"][f"up_{i}"]["up"], reverse=True,
                   blocks=scorer_n_res)

    for ours, theirs in (("semantic", "Semantic"), ("offset", "Offset"),
                         ("embed", "Embed")):
        mlp = params[f"{ours}_mlp"]
        sd[f"{theirs}.0.0.0.weight"] = np.asarray(mlp["Dense_0"]["kernel"]).T
        put_bn(f"{theirs}.0.0.1", mlp["MaskedBatchNorm_0"],
               {"mean": np.zeros(mlp["MaskedBatchNorm_0"]["scale"].shape),
                "var": np.ones(mlp["MaskedBatchNorm_0"]["scale"].shape)},
               fast=True)
        out = params[f"{ours}_out"]
        sd[f"{theirs}.1.weight"] = np.asarray(out["kernel"]).T
        sd[f"{theirs}.1.bias"] = np.asarray(out["bias"])
    sd["ScorerHead.0.weight"] = np.asarray(params["scorer_head"]["kernel"]).T
    sd["ScorerHead.0.bias"] = np.asarray(params["scorer_head"]["bias"])
    return sd


class TestImporter:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        cfg = PanopticConfig(
            num_classes=9, stuff_classes=(0, 7, 8), backbone="tiny", feat_dim=4,
            in_feat=8, num_samples=1, max_instances=16, max_props_rg=16,
            ms_max_seeds=16, ms_max_clusters=8, ms_point_cap=512,
            cluster_radius=0.9,
        )
        model = PointGroup3HeadsNet(cfg)
        vb = collate_tiles(
            [synthetic_tile(rng, n_instances=2, pts_per_instance=40, n_ground=150)],
            1024, 1,
        )
        arrays = batch_arrays(vb)
        db, hier = prepare_example(arrays, cfg.num_down)
        state = init_state(cfg, model, optax.adam(1e-3), db, hier, jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(np.asarray, state.params)
        stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)

        sd = emit_reference_sd(params, stats, n_down=3, n_up=3, n_res=1,
                               s_down=2, s_up=2)
        got_p, got_s = convert_state_dict(
            sd, num_down_blocks=3, num_up_blocks=3, n_res=1,
            scorer_downs=2, scorer_ups=2,
        )
        for sub in ["backbone", "scorer", "semantic_mlp", "semantic_out",
                    "offset_mlp", "offset_out", "embed_mlp", "embed_out",
                    "scorer_head"]:
            ref = jax.tree_util.tree_leaves(params[sub])
            got = jax.tree_util.tree_leaves(got_p[sub])
            assert len(ref) == len(got), sub
            for a, b in zip(ref, got):
                np.testing.assert_allclose(a, b, err_msg=sub)
