#!/usr/bin/env python
"""Import a reference torch-points3d checkpoint (.pt) into this framework's
named-weight-set format, for direct parity evaluation without retraining
(SURVEY.md §7 stage 7 / BASELINE.md targets).

Reference checkpoint layout (metrics/model_checkpoint.py:38-52): one torch
file with ``models: {latest: state_dict, best_<metric>: ...}``, optimizer,
schedulers, run_config, stats. State-dict keys follow the module tree of
PointGroup3heads (PointGroup3heads.py:31-81):

  Backbone.model.down_modules.{i}.conv_in.0.kernel          ME conv [K,Cin,Cout]
  Backbone.model.down_modules.{i}.conv_in.1.bn.{weight,bias,running_mean,running_var}
  Backbone.model.down_modules.{i}.blocks.{b}.block.{0|3}.kernel      ResBlock convs
  Backbone.model.down_modules.{i}.blocks.{b}.block.{1|4}.bn.*        ResBlock BNs
  Backbone.model.down_modules.{i}.blocks.{b}.downsample.{0.kernel,1.bn.*}
  Backbone.model.up_modules.{i}.conv_in.0.kernel / ... (ResNetUp, transposed)
  Semantic.0.{0.0.weight,0.1.batch_norm.*}  Semantic.1.{weight,bias}   heads
  Offset.0.*, Offset.1.*   Embed.0.*, Embed.1.*
  ScorerUnet.model.*       ScorerHead.0.{weight,bias}
  ScorerMLP.* / ScorerEncoder.* (setting-dependent)

Mapping notes:
* ME stores conv kernels as [K, Cin, Cout] with K enumerating the hypercube
  kernel region; this framework uses the same [K, Cin, Cout] layout with
  z-fastest lexicographic offsets. ``--offset-perm`` lets you supply a K
  permutation if the ME region order differs (verify on a real checkpoint
  with a forward-activation diff; identity by default).
* Our transpose convs index weights by the *up* offset = -down offset, i.e.
  ME's ConvolutionTranspose kernels map with the K axis REVERSED.
* torch Linear weights are [out, in] -> transposed to flax [in, out].

Usage:
  python tools/import_torch_checkpoint.py ref.pt out_dir \
      [--weight-set latest] [--feat 16]
"""

import argparse
import os.path as osp
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def me_kernel_offsets(kernel_size: int = 3, dimension: int = 3) -> np.ndarray:
    """MinkowskiEngine HYPER_CUBE kernel-region offset enumeration, [K, dim].

    ME's kernel-region iterator increments the FIRST coordinate fastest and
    carries into higher axes (MinkowskiEngine src/kernel_region.hpp,
    ``operator++``), with per-axis offsets -(k-1)//2..k//2 for odd k and
    0..k-1 for even k. Encoded HERE, once, so the K-permutation into this
    framework's z-fastest table is derived rather than assumed; the dense-grid
    activation-parity tests in tests/test_me_parity.py pin the whole chain
    against torch Conv3d/ConvTranspose3d oracles (VERDICT r1 missing #5).
    """
    if kernel_size % 2 == 1:
        r = kernel_size // 2
        rng = np.arange(-r, r + 1)
    else:
        rng = np.arange(0, kernel_size)
    # first axis fastest: offset[j][a] = rng[(j // k^a) % k]
    k = kernel_size
    j = np.arange(k ** dimension)
    cols = [rng[(j // (k ** a)) % k] for a in range(dimension)]
    return np.stack(cols, axis=1).astype(np.int32)


def me_to_ours_perm(kernel_size: int = 3) -> np.ndarray:
    """K-permutation p with ``W_ours = W_me[p]``: p[k] is the ME kernel index
    whose offset equals our z-fastest offset table's k-th entry
    (ops/sparse.py _kernel_offsets)."""
    from panopticsegforlargescalepointcloud_tpu.ops.sparse import _kernel_offsets

    ours = _kernel_offsets(kernel_size)
    me = me_kernel_offsets(kernel_size)
    lut = {tuple(o): j for j, o in enumerate(me)}
    return np.array([lut[tuple(o)] for o in ours], dtype=np.int64)


def _bn(sd: Dict, prefix: str):
    """torch BN -> (params {scale,bias}, stats {mean,var}). Handles both raw
    `bn.` (MinkowskiBatchNorm) and `batch_norm.` (FastBatchNorm1d) spellings."""
    for stem in (prefix + ".bn", prefix + ".batch_norm", prefix):
        if stem + ".weight" in sd:
            return (
                {
                    "scale": np.asarray(sd[stem + ".weight"]),
                    "bias": np.asarray(sd[stem + ".bias"]),
                },
                {
                    "mean": np.asarray(sd[stem + ".running_mean"]),
                    "var": np.asarray(sd[stem + ".running_var"]),
                },
            )
    raise KeyError(f"no BN under {prefix}")


def _kernel(sd: Dict, key: str, offset_perm=None, reverse: bool = False):
    w = np.asarray(sd[key])
    assert w.ndim == 3, f"{key}: expected ME kernel [K,Cin,Cout], got {w.shape}"
    if offset_perm is not None:
        w = w[offset_perm]
    if reverse:
        w = w[::-1]
    return {"kernel": w.copy()}


def _linear(sd: Dict, prefix: str, bias: bool = True):
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T.copy()}
    if bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def convert_resnet_down(sd, tp_prefix, num_blocks, offset_perm, reverse=False):
    """ResNetDown/Up (api_modules.py:235-311) -> our ResNetDown tree."""
    params: Dict = {}
    stats: Dict = {}
    # conv_in: Seq[conv, bn, relu]
    params["ConvBNReLU_0"] = {
        "SparseConv_0": _kernel(sd, f"{tp_prefix}.conv_in.0.kernel", offset_perm, reverse),
    }
    bn_p, bn_s = _bn(sd, f"{tp_prefix}.conv_in.1")
    params["ConvBNReLU_0"]["MaskedBatchNorm_0"] = bn_p
    stats["ConvBNReLU_0"] = {"MaskedBatchNorm_0": bn_s}
    for b in range(num_blocks):
        bp: Dict = {}
        bs: Dict = {}
        for j, conv_idx, bn_idx in ((0, 0, 1), (1, 3, 4)):
            bp[f"ConvBNReLU_{j}"] = {
                "SparseConv_0": _kernel(
                    sd, f"{tp_prefix}.blocks.{b}.block.{conv_idx}.kernel",
                    offset_perm, reverse,
                )
            }
            p2, s2 = _bn(sd, f"{tp_prefix}.blocks.{b}.block.{bn_idx}")
            bp[f"ConvBNReLU_{j}"]["MaskedBatchNorm_0"] = p2
            bs[f"ConvBNReLU_{j}"] = {"MaskedBatchNorm_0": s2}
        ds_key = f"{tp_prefix}.blocks.{b}.downsample.0.kernel"
        if ds_key in sd:
            w = np.asarray(sd[ds_key])  # ME 1x1 conv: [Cin, Cout] or [1,Cin,Cout]
            if w.ndim == 3:
                w = w[0]
            bp["Dense_0"] = {"kernel": w.copy()}
            p3, s3 = _bn(sd, f"{tp_prefix}.blocks.{b}.downsample.1")
            bp["MaskedBatchNorm_0"] = p3
            bs["MaskedBatchNorm_0"] = s3
        params[f"ResBlock_{b}"] = bp
        stats[f"ResBlock_{b}"] = bs
    return params, stats


def convert_head(sd, tp_prefix):
    """Seq[MLP([F,F],bias=False), Linear] -> (PointMLP params, Dense params)."""
    mlp_p = {"Dense_0": _linear(sd, f"{tp_prefix}.0.0.0", bias=False)}
    bn_p, bn_s = _bn(sd, f"{tp_prefix}.0.0.1")
    mlp_p["MaskedBatchNorm_0"] = bn_p
    mlp_s = {"MaskedBatchNorm_0": bn_s}
    dense = _linear(sd, f"{tp_prefix}.1")
    return mlp_p, mlp_s, dense


def convert_state_dict(sd: Dict, num_down_blocks=7, num_up_blocks=7,
                       n_res=2, scorer_downs=2, scorer_ups=2,
                       scorer_n_res=2, offset_perm=None):
    """Full PointGroup3heads state_dict -> (params, batch_stats) pytrees."""
    params: Dict = {"backbone": {}, "scorer": {}}
    stats: Dict = {"backbone": {}, "scorer": {}}
    for i in range(num_down_blocks):
        p, s = convert_resnet_down(
            sd, f"Backbone.model.down_modules.{i}", n_res, offset_perm
        )
        params["backbone"][f"down_{i}"] = p
        stats["backbone"][f"down_{i}"] = s
    for i in range(num_up_blocks):
        p, s = convert_resnet_down(
            sd, f"Backbone.model.up_modules.{i}", n_res, offset_perm, reverse=True
        )
        params["backbone"][f"up_{i}"] = {"up": p}
        stats["backbone"][f"up_{i}"] = {"up": s}
    for i in range(scorer_downs):
        p, s = convert_resnet_down(
            sd, f"ScorerUnet.model.down_modules.{i}", scorer_n_res, offset_perm
        )
        params["scorer"][f"down_{i}"] = p
        stats["scorer"][f"down_{i}"] = s
    for i in range(scorer_ups):
        p, s = convert_resnet_down(
            sd, f"ScorerUnet.model.up_modules.{i}", scorer_n_res, offset_perm,
            reverse=True,
        )
        params["scorer"][f"up_{i}"] = {"up": p}
        stats["scorer"][f"up_{i}"] = {"up": s}

    for ours, theirs in (
        ("semantic", "Semantic"), ("offset", "Offset"), ("embed", "Embed"),
    ):
        mlp_p, mlp_s, dense = convert_head(sd, theirs)
        params[f"{ours}_mlp"] = mlp_p
        stats[f"{ours}_mlp"] = mlp_s
        params[f"{ours}_out"] = dense
    params["scorer_head"] = _linear(sd, "ScorerHead.0")
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--weight-set", default="latest")
    ap.add_argument("--offset-perm", default=None,
                    help="comma-separated K permutation for ME kernel regions")
    ap.add_argument("--me-order", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="apply the ME x-fastest -> ours z-fastest kernel "
                    "permutation (me_to_ours_perm; validated by "
                    "tests/test_me_parity.py). On by default; disable with "
                    "--no-me-order for checkpoints whose conv weights are "
                    "already in this framework's K order; --offset-perm "
                    "overrides both.")
    args = ap.parse_args()

    import torch

    from panopticsegforlargescalepointcloud_tpu.train.checkpoint import (
        ModelCheckpoint,
    )

    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = blob["models"][args.weight_set]
    sd = {k: v for k, v in sd.items()}
    if args.offset_perm:
        perm = np.array([int(x) for x in args.offset_perm.split(",")])
    elif args.me_order:
        perm = me_to_ours_perm(3)
    else:
        perm = None
    params, stats = convert_state_dict(sd, offset_perm=perm)
    ck = ModelCheckpoint(args.out_dir, run_config=blob.get("run_config", {}))
    ck.save_best_models_under_current_metrics(
        {"params": params, "batch_stats": stats}, None, {}
    )
    print(f"imported {args.weight_set} -> {ck.path}")


if __name__ == "__main__":
    main()
