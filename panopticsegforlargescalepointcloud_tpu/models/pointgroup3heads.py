"""PointGroup3Heads: the paper's panoptic model, TPU-native.

Re-design of ``/root/reference/torch_points3d/models/panoptic/
PointGroup3heads.py`` (backbone + Semantic/Offset/Embed heads :69-81, cluster
strategies _cluster.._cluster6 :163-391, ScoreNet _compute_score :393-454,
loss assembly _compute_loss :552-634) with everything on device and fixed
shape:

* clustering runs as label propagation / batched mean-shift (no CPU
  excursions, no multiprocessing pool);
* proposals are padded membership tables; the ScoreNet minibatch is a second
  SparseGrid whose "batch" field is the proposal id and whose coords are
  re-centered per proposal (translation-invariant, keeps the packed keys in
  range);
* the prepare-epoch gate (clustering only after `prepare_epoch`) selects
  between two jitted step functions instead of python branching inside one.

Cluster-type map (reference :115-147):
  1: region-grow on pos+offset            (tags: 0)
  2: rg on pos + rg on pos+offset         (tags: 0, 1)
  3: mean-shift on embeddings             (tags: 0)
  4: rg on pos + mean-shift               (tags: 0, 1)
  5: rg on pos+offset + mean-shift        (tags: 0, 1)   <- paper setting IV
  6: rg pos + rg pos+offset + mean-shift  (tags: 0, 1, 2) <- paper setting V
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..cluster.hdbscan import hdbscan_labels
from ..cluster.meanshift import mean_shift, pack_by_sample
from ..cluster.region_grow import region_grow_folded
from ..ops.hashing import BitLayout
from ..ops.hierarchy import Hierarchy, build_hierarchy
from ..ops.scatter import segment_max, segment_min
from ..ops.sparse import make_grid
from .losses import (
    Proposals,
    discriminative_loss,
    instance_iou,
    instance_iou_loss,
    mask_loss,
    offset_loss,
    semantic_nll_loss,
)
from .modules import PointMLP
from .plans import (
    paper_backbone_plan,
    scorer_encoder_plan,
    scorer_unet_plan,
    tiny_backbone_plan,
)
from .point_backbones import KPConvBackbone, PointNet2Backbone
from .unet import SparseEncoder, SparseUNet

# PointGroupEmbed strategy table (Setting I family; reference
# pointgroupembed.py:219-790, exact op/space/loop parameters extracted from
# each _clusterN): every op is (method, space, loops, low, high).
# loops == 0 -> one clustering run on the full feature set; loops == L -> L
# runs, each on a random dim-subset of size in [low, high] of the space
# (reference hdbscan_cluster.cluster_loop / meanshift_cluster.cluster_loop;
# subset selection here is deterministic per run index - fixed-shape jit has
# no per-forward RNG, and the reference resamples purely for proposal
# diversity, which fixed distinct subsets provide equally).
# Spaces: "xyz" = raw positions, "embed" = embedding head output,
# "both" = concat(xyz, embed); "rg" ops region-grow on raw positions.
EMBED_STRATEGIES = {
    1: (("hdbscan", "xyz", 0, 0, 0), ("hdbscan", "embed", 0, 0, 0)),
    2: (("hdbscan", "both", 9, 3, 5), ("hdbscan", "embed", 0, 0, 0)),
    3: (("hdbscan", "both", 9, 3, 5), ("hdbscan", "xyz", 0, 0, 0)),
    4: (("hdbscan", "both", 8, 3, 5), ("hdbscan", "embed", 0, 0, 0),
        ("hdbscan", "xyz", 0, 0, 0)),
    5: (("hdbscan", "both", 10, 3, 5),),
    6: (("hdbscan", "embed", 6, 2, 5),),
    7: (("meanshift", "embed", 0, 0, 0),),
    8: (("rg", "pos", 0, 0, 0), ("meanshift", "embed", 0, 0, 0)),
    9: (("rg", "pos", 0, 0, 0), ("meanshift", "embed", 10, 3, 5)),
    10: (("meanshift", "embed", 6, 2, 5),),
    11: (("hdbscan", "embed", 6, 2, 5),),
    12: (("rg", "pos", 0, 0, 0), ("meanshift", "embed", 6, 2, 5)),
    13: (("hdbscan", "embed", 6, 2, 5), ("hdbscan", "xyz", 0, 0, 0)),
    14: (("hdbscan", "embed", 0, 0, 0),),
    15: (("meanshift", "embed", 6, 2, 5), ("hdbscan", "embed", 0, 0, 0)),
    16: (("hdbscan", "embed", 6, 2, 5), ("meanshift", "embed", 0, 0, 0)),
}

# Default scorer-grid bit layout: batch field = proposal id (32-7-7-9 = 9 bits
# -> 510 proposals), coords are per-proposal *centered* offsets so the signed
# budget is +-64 voxels laterally and +-256 vertically (51 m at 0.2 m voxels -
# FOR-instance trees are 20-30 m tall, see VERDICT r1 #3). Overridable per
# model config via PanopticConfig.scorer_bits.
SCORER_BITS = BitLayout(7, 7, 9)


@dataclasses.dataclass(frozen=True)
class PanopticConfig:
    """Static model + clustering configuration (the reference model YAML)."""

    num_classes: int
    stuff_classes: Tuple[int, ...]
    feat_dim: int = 4
    in_feat: int = 16
    embed_dim: int = 5
    # "3heads" (PointGroup3Heads, Settings II-V) or "embed" (PointGroupEmbed,
    # Setting I: no offset head, cluster strategies from EMBED_STRATEGIES)
    model_family: str = "3heads"
    cluster_type: int = 5
    bandwidth: float = 0.6
    cluster_radius: float = 0.3  # 1.5 * grid_size
    prepare_epoch: int = 30
    scorer_type: str = "unet"  # "unet" | "encoder" | "mlp" | "" (semantic certainty)
    use_score_net: bool = True
    mask_supervise: bool = False
    use_mask_filter_score_feature: bool = False
    # reference gate (PointGroup3heads.py:63,430): the mask filter activates
    # only when epoch > start_epoch; the trainer re-jits the step when the
    # gate flips (static branch, no traced control flow)
    use_mask_filter_score_feature_start_epoch: int = 200
    mask_filter_score_feature_thre: float = 0.5
    cal_iou_based_on_mask: bool = False
    # reference gate (PointGroup3heads.py:67,594): mask-based IoU targets
    # activate only when epoch > start_epoch
    cal_iou_based_on_mask_start_epoch: int = 200
    min_iou_threshold: float = 0.25
    max_iou_threshold: float = 0.75
    block_merge_th: float = 0.01
    # loss weights (PointGroup-PAPER yaml :77-83)
    w_semantic: float = 1.0
    w_offset_norm: float = 0.1
    w_offset_dir: float = 0.1
    w_score: float = 1.0
    w_embed: float = 1.0
    w_mask: float = 1.0
    # static budgets
    num_samples: int = 4  # B tiles per device-local batch
    max_instances: int = 64  # K (NUM_MAX_OBJECTS)
    max_props_rg: int = 128  # per region-grow source
    ms_max_seeds: int = 128
    ms_max_clusters: int = 32  # per sample
    ms_point_cap: int = 16384  # thing points per sample fed to mean-shift
    scorer_capacity_mult: float = 1.0  # scorer grid rows per membership row
    # 16 fwd + 16 reverse edges per point: connectivity only needs each
    # in-radius pair covered once (the symmetric union does), and the loop's
    # per-iteration gather is adjacency-width-bound (v5e profile)
    rg_k_neighbors: int = 16
    # static thing-row budget for region growing: > 0 compacts eligible rows
    # to the resolved cap before the radius graph + propagation loop run, so
    # their per-row costs scale with the thing count, not the padded voxel
    # count (the reference's C++ BFS walks thing points only). 0 = off.
    # Values in (0, 1) are a FRACTION of the forward's padded row count,
    # resolved per trace (resolved_point_cap) and rounded up to the dense-
    # grow tile (2048) - one shipped yaml value sizes the 131k training
    # batch, the 32k eval tile, and grouped dispatch alike. Values >= 1 are
    # absolute rows. Thing rows beyond the cap are dropped and counted
    # (cluster_overflow).
    rg_point_cap: float = 0
    # candidate scan budget per cell: cells have side = cluster_radius, so a
    # voxel grid averages ~3.4 occupants/cell; 8 gives 2.3x headroom while
    # halving candidate gathers + top_k width vs 16 (truncation only trims
    # edges of over-dense cells - components stay connected)
    rg_cell_cap: int = 8
    # dense MXU min-pull region growing (cluster/dense_grow.py): propagate
    # over the EXACT all-pairs radius graph via distance matmuls instead of
    # building edge lists (no k/cell_cap truncation). Needs rg_point_cap;
    # "auto" = on when running on TPU, "on"/"off" to force.
    rg_dense: str = "auto"
    min_cluster_size: int = 10
    # HDBSCAN-style density grouping (embed family; reference hyperparams
    # hdbscan_cluster.py:9)
    hd_min_samples: int = 5
    hd_min_cluster_size: int = 15
    hd_epsilon: float = 0.006
    hd_max_clusters: int = 32  # per sample, single (non-loop) runs
    hd_point_cap: int = 2048  # thing points per sample fed to hdbscan
    hd_selection: str = "eom"  # condensed-tree eom (exact) | "gap" (cheap)
    loop_max_clusters: int = 8  # per sample per random-subset run
    embed_subset_seed: int = 0  # deterministic dim-subset selection
    # eval-time instance extraction (structure_3heads.py:28)
    nms_threshold: float = 0.3
    min_cluster_points: int = 100
    min_score: float = 0.5
    # conv execution: "loop" = 27 column gathers + small GEMMs (wins on v5e -
    # gather cost is per-row, so avoiding the [N,27,C] materialization beats
    # the single wide GEMM; 259k vs 205k voxels/s/chip, PLAN.md r2);
    # "fused" = one [N,27C]x[27C,Cout] GEMM (~6x faster to COMPILE - the right
    # call on CPU test runs); "auto" = loop on TPU, fused elsewhere
    gemm_mode: str = "auto"
    # Pallas windowed-streaming conv (ops/winconv.py): "auto" = on for TPU
    # backends, off elsewhere (CPU tests use the row path; the kernel's
    # interpret mode is exercised by tests/test_winconv.py); "on"/"off"
    # force it. 3.6-4.9x per conv on v5e (scripts/bench_winconv.py).
    use_winconv: str = "auto"
    # keep trunk activations lane-packed between windowed convs (see
    # models/modules.py: removes the (8,128) tile-padded f32 HBM roundtrip
    # per conv); only consulted where the windowed kernel runs
    packed_trunk: bool = True
    compute_dtype: str = "bfloat16"  # conv gather/GEMM precision (fp32 accum)
    # "paper" (7-level sparse-conv UNet) | "tiny" (3 levels, CI) |
    # "kpconv" (kernel-point conv UNet, reference KPConvPaper) |
    # "pointnet2" (PointNet++ MSG UNet, reference PointNet2_D)
    backbone: str = "paper"
    # --- point-backbone (KPConv / PointNet++) knobs; see
    # models/point_backbones.py. grid_size is the data voxel size in meters
    # (level-l neighborhoods scale with grid_size * 2^l).
    grid_size: float = 0.2
    point_levels: int = 4  # strided levels for point backbones
    kp_base_channels: int = 64
    kp_num_kernel_points: int = 15
    kp_sigma: float = 1.0
    kp_max_neighbors: int = 16
    # deformable kernel points (reference KPConvDeformableLayer,
    # modules/KPConv/kernels.py:107-249): encoder blocks past the stem
    # predict per-query kernel offsets; their fitting/repulsion (or
    # permissive) regularizers are weighted into the loss by
    # lambda_internal_losses (reference base_model.py:389-402)
    kp_deformable: bool = False
    kp_modulated: bool = False
    kp_loss_mode: str = "fitting"  # "fitting" | "permissive"
    lambda_internal_losses: float = 0.1
    pn2_base_channels: int = 32
    pn2_radius_scale: float = 2.5
    pn2_nsample: int = 16
    # candidate scan budget per hash cell in the point backbones' radius
    # queries; cells have side = the query radius, so dense clouds with wide
    # grouping radii need more (truncation drops candidates in scan order,
    # which is absolute-frame-dependent - raise until neighbor sets saturate)
    point_cell_cap: int = 16
    use_bricks: bool = False  # brick-dense submanifold convs (see PLAN.md)
    # rematerialize UNet levels in backward (needed to fit the full train
    # step in HBM at paper batch sizes; no-op at eval) - models/unet.py
    remat: bool = True
    brick_size: int = 2  # submanifold-conv brick edge (ops/brick.py)
    brick_factor: float = 0.5  # brick capacity per level voxel capacity
    # ScoreNet grid key layout (x, y, z bits); proposal id lives in the
    # remaining 32-(bx+by+bz) bits, so total_props must stay below
    # 2^(32-bx-by-bz) - 1.
    scorer_bits: Tuple[int, int, int] = (7, 7, 9)

    def __post_init__(self):
        layout = BitLayout(*self.scorer_bits)
        if self.total_props >= layout.max_batch:
            raise ValueError(
                f"scorer_bits {self.scorer_bits} leave only "
                f"{layout.max_batch - 1} proposal ids but the cluster budget "
                f"needs {self.total_props}; widen the proposal-id field "
                f"(fewer coord bits) or shrink max_props_rg/ms budgets"
            )

    @property
    def scorer_layout(self) -> BitLayout:
        return BitLayout(*self.scorer_bits)

    @property
    def win_enabled(self) -> bool:
        if self.use_winconv == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return self.use_winconv in (True, "on", "true", "1")

    @property
    def rg_dense_enabled(self) -> bool:
        if not self.rg_point_cap:
            return False  # dense pull runs on the compacted row set only
        if self.rg_dense == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return self.rg_dense in (True, "on", "true", "1")

    def resolved_point_cap(self, n: int) -> int:
        """Static thing-row budget for ``n`` padded rows: fractions in (0, 1)
        resolve to ceil(frac * n) rounded up to the dense-grow tile (2048,
        dense_grow.supports_dense); absolute values pass through. Clamped to
        ``n`` - a cap covering every row disables compaction (exact path)."""
        cap = self.rg_point_cap
        if not cap:
            return 0
        if 0 < cap < 1:
            import math

            t = math.ceil(cap * n / 2048.0) * 2048
        else:
            t = int(cap)
        return min(t, n)

    @property
    def is_point_backbone(self) -> bool:
        return self.backbone in ("kpconv", "pointnet2")

    @property
    def num_down(self) -> int:
        if self.is_point_backbone:
            return self.point_levels
        return 6 if self.backbone == "paper" else 2

    @property
    def has_offset(self) -> bool:
        return self.model_family != "embed"

    @property
    def embed_ops(self) -> Tuple[Tuple, ...]:
        return EMBED_STRATEGIES[self.cluster_type]

    @property
    def num_sources(self) -> int:
        if self.model_family == "embed":
            return len(self.embed_ops)
        return {1: 1, 2: 2, 3: 1, 4: 2, 5: 2, 6: 3}[self.cluster_type]

    @property
    def rg_sources(self) -> Tuple[str, ...]:
        """Which geometric inputs feed region growing, in tag order."""
        if self.model_family == "embed":
            return tuple(op[1] for op in self.embed_ops if op[0] == "rg")
        return {
            1: ("vote",),
            2: ("pos", "vote"),
            3: (),
            4: ("pos",),
            5: ("vote",),
            6: ("pos", "vote"),
        }[self.cluster_type]

    @property
    def use_meanshift(self) -> bool:
        if self.model_family == "embed":
            return any(op[0] == "meanshift" for op in self.embed_ops)
        return self.cluster_type in (3, 4, 5, 6)

    def _op_budget(self, op) -> int:
        method, _, loops, _, _ = op
        if method == "rg":
            return self.max_props_rg
        if loops == 0:
            per = self.hd_max_clusters if method == "hdbscan" else self.ms_max_clusters
            return self.num_samples * per
        return loops * self.num_samples * self.loop_max_clusters

    @property
    def total_props(self) -> int:
        if self.model_family == "embed":
            return sum(self._op_budget(op) for op in self.embed_ops)
        p = len(self.rg_sources) * self.max_props_rg
        if self.use_meanshift:
            p += self.num_samples * self.ms_max_clusters
        return p


class PanopticOutput(NamedTuple):
    semantic_logits: jnp.ndarray  # [N, C] log-probs
    offset_logits: jnp.ndarray  # [N, 3]
    embed_logits: jnp.ndarray  # [N, E]
    backbone_feats: jnp.ndarray  # [N, F]
    proposals: Optional[Proposals]
    cluster_scores: Optional[jnp.ndarray]  # [P]
    mask_scores: Optional[jnp.ndarray]  # [M] raw logits per membership row
    mask_row_valid: Optional[jnp.ndarray] = None  # [M] member has a scorer row
    scorer_overflow: Optional[jnp.ndarray] = None  # members outside bit budget
    cluster_overflow: Optional[jnp.ndarray] = None  # thing rows past cluster caps
    rg_graph_trunc: Optional[jnp.ndarray] = None  # degraded radius-graph rows
    # summed KPConv-deform regularizers by name (train only; reference
    # BaseInternalLossModule collection, base_model.py:363-402)
    internal_losses: Optional[dict] = None


class PointGroup3HeadsNet(nn.Module):
    """Flax module: backbone + 3 heads + scorer nets.

    Heads follow the reference exactly (:69-81): each head is
    MLP([F, F], bias=False) -> Linear(out); Semantic adds LogSoftmax.
    """

    cfg: PanopticConfig

    def setup(self):
        if self.cfg.backbone == "kpconv":
            self.backbone = KPConvBackbone(
                num_levels=self.cfg.point_levels,
                base_channels=self.cfg.kp_base_channels,
                out_nc=self.cfg.in_feat,
                grid_size=self.cfg.grid_size,
                sigma=self.cfg.kp_sigma,
                num_kernel_points=self.cfg.kp_num_kernel_points,
                max_neighbors=self.cfg.kp_max_neighbors,
                cell_cap=self.cfg.point_cell_cap,
                deformable=self.cfg.kp_deformable,
                modulated=self.cfg.kp_modulated,
                loss_mode=self.cfg.kp_loss_mode,
                compute_dtype=self.cfg.compute_dtype,
                remat=self.cfg.remat,
            )
        elif self.cfg.backbone == "pointnet2":
            self.backbone = PointNet2Backbone(
                num_levels=self.cfg.point_levels,
                base_channels=self.cfg.pn2_base_channels,
                out_nc=self.cfg.in_feat,
                grid_size=self.cfg.grid_size,
                radius_scale=self.cfg.pn2_radius_scale,
                nsample=self.cfg.pn2_nsample,
                cell_cap=self.cfg.point_cell_cap,
                compute_dtype=self.cfg.compute_dtype,
                remat=self.cfg.remat,
            )
        else:
            if self.cfg.backbone == "paper":
                plan = paper_backbone_plan(self.cfg.feat_dim, self.cfg.in_feat)
            else:
                plan = tiny_backbone_plan(self.cfg.feat_dim, self.cfg.in_feat)
            self.backbone = SparseUNet(
                **plan, gemm_mode=self.cfg.gemm_mode,
                compute_dtype=self.cfg.compute_dtype, remat=self.cfg.remat,
                packed_io=self.cfg.packed_trunk,
            )
        f = self.cfg.in_feat
        self.semantic_mlp = PointMLP((f,), use_bias=False)
        self.semantic_out = nn.Dense(self.cfg.num_classes)
        if self.cfg.has_offset:
            # the embed family (reference PointGroupEmbed :69-81) has no
            # offset head: semantic + embedding only
            self.offset_mlp = PointMLP((f,), use_bias=False)
            self.offset_out = nn.Dense(3)
        self.embed_mlp = PointMLP((f,), use_bias=False)
        self.embed_out = nn.Dense(self.cfg.embed_dim)
        if self.cfg.scorer_type == "encoder":
            self.scorer_encoder = SparseEncoder(
                **scorer_encoder_plan(f), num_segments=self.cfg.total_props,
                gemm_mode=self.cfg.gemm_mode, compute_dtype=self.cfg.compute_dtype,
                remat=self.cfg.remat, packed_io=self.cfg.packed_trunk,
            )
        elif self.cfg.scorer_type == "mlp":
            # reference ScorerMLP: MLP([out_nc, out_nc, scorer_out_nc]) (:50)
            self.scorer_mlp = PointMLP((f, f))
        else:
            self.scorer = SparseUNet(
                **scorer_unet_plan(f), gemm_mode=self.cfg.gemm_mode,
                compute_dtype=self.cfg.compute_dtype, remat=self.cfg.remat,
                packed_io=self.cfg.packed_trunk,
            )
        self.scorer_head = nn.Dense(1)
        if self.cfg.mask_supervise:
            self.mask_score_a = nn.Dense(f)
            self.mask_score_b = nn.Dense(1)

    def backbone_heads(
        self, feats, hier: Hierarchy, train: bool, momentum=0.1, pos=None
    ):
        mask = hier.grids[0].mask
        if self.cfg.is_point_backbone:
            if pos is None:
                # init / shape-tracing fallback: voxel centers from the
                # level-0 integer coords (values only differ, never shapes)
                pos = (
                    hier.grids[0].coords.astype(jnp.float32) + 0.5
                ) * self.cfg.grid_size
            x = self.backbone(feats, pos, hier, train, momentum)
        else:
            x = self.backbone(feats, hier, train, momentum)
        sem = self.semantic_out(self.semantic_mlp(x, mask, train, momentum))
        sem = jax.nn.log_softmax(sem, axis=-1)
        if self.cfg.has_offset:
            off = self.offset_out(self.offset_mlp(x, mask, train, momentum))
        else:
            off = jnp.zeros((x.shape[0], 3), x.dtype)
        emb = self.embed_out(self.embed_mlp(x, mask, train, momentum))
        m = mask[:, None]
        return x, sem, jnp.where(m, off, 0.0), jnp.where(m, emb, 0.0)

    def score(
        self,
        scorer_feats,
        scorer_hier: Hierarchy,
        prop_of_row: jnp.ndarray,  # [rows] proposal id per scorer grid row (-1 pad)
        num_props: int,
        train: bool,
        momentum=0.1,
        epoch: int | None = None,
    ):
        """Scorer net (unet | mlp | encoder, reference _compute_score
        :393-454) -> (optional mask logits) -> segment max -> sigmoid head.

        ``epoch`` is STATIC (python int): the mask score-feature filter only
        activates when ``epoch > cfg.use_mask_filter_score_feature_start_epoch``
        (reference :430). None = gate open (eval from a converged checkpoint,
        and tests that flip the flag directly)."""
        seg0 = jnp.where(prop_of_row >= 0, prop_of_row, -1)
        if self.cfg.scorer_type == "encoder":
            cluster_feats = self.scorer_encoder(
                scorer_feats, scorer_hier, train, momentum
            )
            scores = jax.nn.sigmoid(self.scorer_head(cluster_feats))[:, 0]
            return scores, None
        if self.cfg.scorer_type == "mlp":
            out = self.scorer_mlp(
                scorer_feats, scorer_hier.grids[0].mask, train, momentum
            )
            cluster_feats = segment_max(out, seg0, num_props, fill=0.0)
            scores = jax.nn.sigmoid(self.scorer_head(cluster_feats))[:, 0]
            return scores, None
        out = self.scorer(scorer_feats, scorer_hier, train, momentum)
        mask_logits = None
        if self.cfg.mask_supervise:
            h = nn.relu(self.mask_score_a(out))
            mask_logits = self.mask_score_b(h)[:, 0]
            filter_on = self.cfg.use_mask_filter_score_feature and (
                epoch is None
                or epoch > self.cfg.use_mask_filter_score_feature_start_epoch
            )
            if filter_on:
                keep = jax.nn.sigmoid(mask_logits) >= self.cfg.mask_filter_score_feature_thre
                out = out * keep[:, None]
        seg = jnp.where(prop_of_row >= 0, prop_of_row, -1)
        cluster_feats = segment_max(out, seg, num_props, fill=0.0)
        scores = jax.nn.sigmoid(self.scorer_head(cluster_feats))[:, 0]
        return scores, mask_logits

    def __call__(self, feats, hier, scorer_feats, scorer_hier, prop_of_row, train):
        """Init-only path touching every submodule."""
        x, sem, off, emb = self.backbone_heads(feats, hier, train)
        scores, _ = self.score(
            scorer_feats, scorer_hier, prop_of_row, self.cfg.total_props, train
        )
        return sem, off, emb, scores


def _subset_masks(
    cfg: PanopticConfig,
    space: str,
    loops: int,
    low: int,
    high: int,
    subset_key=None,
    tag: int = 0,
):
    """0/1 dim masks for one strategy op ([runs, 3+E]).

    Zeroing unselected dims makes every distance equal the subspace distance,
    so "cluster on a random feature subset" becomes a fixed-shape multiply
    (reference picks ``randint(low, high+1)`` dims via torch.multinomial per
    forward, hdbscan_cluster.py:28-34). With ``subset_key`` (jax PRNG keys of
    shape [num_samples, 2] - one per sample) the subsets are resampled
    in-trace PER SAMPLE, returning [num_samples, runs, 3+E]: under grouped
    eval dispatch each tile draws from its own counter, matching the g=1
    sequential path bit-for-bit (callers sharing one counter across the batch
    broadcast it, which reproduces one shared draw per forward - the
    reference's training behavior). ``subset_key=None`` falls back to fixed
    numpy masks seeded by ``embed_subset_seed`` ([runs, 3+E], deterministic
    per run index; used by tests and single-shot paths)."""
    import numpy as np

    d = 3 + cfg.embed_dim
    pool = {
        "xyz": np.arange(3),
        "embed": np.arange(3, d),
        "both": np.arange(d),
    }[space]
    if loops == 0:
        m = np.zeros((1, d), np.float32)
        m[0, pool] = 1.0
        return m
    if subset_key is not None:
        pool_b = jnp.zeros((d,), bool).at[jnp.asarray(pool)].set(True)

        def masks_for_key(key):
            rows = []
            for i in range(loops):
                ki = jax.random.fold_in(key, tag * 131 + i)
                ku, kk = jax.random.split(ki)
                noise = jnp.where(pool_b, jax.random.uniform(ku, (d,)), -1.0)
                k = jax.random.randint(kk, (), low, high + 1)
                k = jnp.minimum(k, len(pool))
                order = jnp.argsort(-noise)
                rank = jnp.zeros((d,), jnp.int32).at[order].set(
                    jnp.arange(d, dtype=jnp.int32)
                )
                rows.append(((rank < k) & pool_b).astype(jnp.float32))
            return jnp.stack(rows)

        return jax.vmap(masks_for_key)(subset_key)  # [B, loops, d]
    rng = np.random.default_rng(cfg.embed_subset_seed)
    masks = np.zeros((loops, d), np.float32)
    for i in range(loops):
        k = int(rng.integers(low, high + 1))
        k = min(k, len(pool))
        masks[i, rng.choice(pool, size=k, replace=False)] = 1.0
    return masks


def _embed_proposals(
    cfg: PanopticConfig,
    pos: jnp.ndarray,
    embeds: jnp.ndarray,
    pred: jnp.ndarray,
    batch: jnp.ndarray,
    thing: jnp.ndarray,
    subset_seed=None,
) -> Tuple[Proposals, jnp.ndarray]:
    """PointGroupEmbed cluster strategies (EMBED_STRATEGIES table): density
    grouping / mean-shift over xyz / embeddings / random feature subsets,
    plus optional region-growing (reference pointgroupembed.py:219-790).

    Returns (proposals, cluster_overflow, graph_trunc): thing rows left out
    of any clustering run by the static pack/point caps, and radius-graph
    degradation counts (possible under-merge, see neighbors.radius_graph)."""
    n = pos.shape[0]
    subset_key = None
    if subset_seed is not None:
        # per-forward resampled feature subsets (reference parity): the
        # caller's counter (train step / voting run + tile) keeps runs
        # reproducible while proposals vary forward-to-forward. A scalar
        # counter broadcasts to every sample (one shared draw per forward -
        # training); a [num_samples] counter array gives each sample its own
        # draw, so grouped eval dispatch matches g=1 tile-sequential eval
        # bit-for-bit (VERDICT r3 weak #7).
        seeds = jnp.asarray(subset_seed, jnp.uint32).reshape(-1)
        seeds = jnp.broadcast_to(seeds, (cfg.num_samples,)) \
            if seeds.shape[0] == 1 else seeds
        assert seeds.shape == (cfg.num_samples,), seeds.shape
        base = jax.random.PRNGKey(cfg.embed_subset_seed)
        subset_key = jax.vmap(lambda s: jax.random.fold_in(base, s))(seeds)
    feats_all = jnp.concatenate(
        [pos.astype(jnp.float32), embeds.astype(jnp.float32)], axis=1
    )
    packs = {}
    overflow = jnp.zeros((), jnp.int32)
    gtrunc = jnp.zeros((), jnp.int32)

    def get_pack(cap):
        if cap not in packs:
            packs[cap] = pack_by_sample(
                feats_all, batch, thing, cfg.num_samples, cap
            )
        return packs[cap]

    point_blocks, prop_valid_parts, prop_batch_parts, prop_type_parts = [], [], [], []
    id_offset = 0
    tag = 0
    sample_ids = jnp.arange(cfg.num_samples, dtype=jnp.int32)[:, None]

    for method, space, loops, low, high in cfg.embed_ops:
        if method == "rg":
            rg = region_grow_folded(
                pos, pred, batch, thing,
                radius=cfg.cluster_radius,
                max_proposals=cfg.max_props_rg,
                num_classes=cfg.num_classes,
                num_samples=cfg.num_samples,
                min_cluster_size=cfg.min_cluster_size,
                k_neighbors=cfg.rg_k_neighbors,
                cell_cap=cfg.rg_cell_cap,
                point_cap=cfg.resolved_point_cap(n),
                dense_pull=cfg.rg_dense_enabled,
            )
            overflow = overflow + rg.overflow
            gtrunc = gtrunc + rg.graph_trunc
            pid = jnp.where(rg.point_prop >= 0, rg.point_prop + id_offset, -1)
            point_blocks.append(pid)
            prop_valid_parts.append(rg.prop_valid)
            prop_batch_parts.append(rg.prop_batch)
            prop_type_parts.append(jnp.full((cfg.max_props_rg,), tag, jnp.int32))
            id_offset += cfg.max_props_rg
            tag += 1
            continue

        cap = cfg.hd_point_cap if method == "hdbscan" else cfg.ms_point_cap
        count_drop = cap not in packs  # one pack per cap -> count its
        dense, dvalid, src_row, dropped = get_pack(cap)  # drops exactly once
        if count_drop:
            overflow = overflow + dropped
        counts = jnp.sum(dvalid.astype(jnp.int32), axis=1)
        # reference skips samples with too few thing points (cluster_loop's
        # sum(batch_mask) > 5 / cluster_single's > 3)
        run_valid = dvalid & (counts > (5 if loops > 0 else 3))[:, None]
        percap = (
            cfg.loop_max_clusters
            if loops > 0
            else (cfg.hd_max_clusters if method == "hdbscan" else cfg.ms_max_clusters)
        )
        masks = _subset_masks(
            cfg, space, loops, low, high, subset_key=subset_key, tag=tag
        )
        # [B, runs, d] = per-sample in-trace draws; [runs, d] = fixed numpy
        per_sample = getattr(masks, "ndim", 2) == 3
        for li in range(masks.shape[1] if per_sample else masks.shape[0]):
            if per_sample:
                masked = dense * masks[:, li, :][:, None, :]
            else:
                masked = dense * jnp.asarray(masks[li])[None, None, :]
            if method == "hdbscan":
                res = hdbscan_labels(
                    masked, run_valid,
                    min_samples=cfg.hd_min_samples,
                    min_cluster_size=cfg.hd_min_cluster_size,
                    epsilon=cfg.hd_epsilon,
                    max_clusters=percap,
                    selection=cfg.hd_selection,
                )
                lab, ncl = res.labels, res.num_clusters
            else:
                ms = mean_shift(
                    masked, run_valid, bandwidth=cfg.bandwidth,
                    max_seeds=cfg.ms_max_seeds,
                )
                lab = jnp.where(
                    (ms.labels >= 0) & (ms.labels < percap), ms.labels, -1
                )
                ncl = jnp.minimum(ms.num_clusters, percap)
            dense_pid = jnp.where(
                lab >= 0, id_offset + sample_ids * percap + lab, -1
            )
            flat_pid = jnp.full((n + 1,), -1, jnp.int32)
            tgt = jnp.where(src_row >= 0, src_row, n)
            flat_pid = flat_pid.at[tgt.reshape(-1)].set(
                dense_pid.reshape(-1), mode="drop"
            )
            point_blocks.append(flat_pid[:n])
            cl_ids = jnp.arange(percap, dtype=jnp.int32)
            pv = (cl_ids[None, :] < ncl[:, None]).reshape(-1)
            pb = jnp.broadcast_to(
                sample_ids, (cfg.num_samples, percap)
            ).reshape(-1)
            prop_valid_parts.append(pv)
            prop_batch_parts.append(jnp.where(pv, pb, -1))
            prop_type_parts.append(
                jnp.full((cfg.num_samples * percap,), tag, jnp.int32)
            )
            id_offset += cfg.num_samples * percap
            tag += 1

    point_idx = jnp.tile(jnp.arange(n, dtype=jnp.int32), len(point_blocks))
    prop_id = jnp.concatenate(point_blocks)
    member_valid = prop_id >= 0
    props = Proposals(
        point_idx=jnp.where(member_valid, point_idx, -1),
        prop_id=prop_id,
        member_valid=member_valid,
        prop_valid=jnp.concatenate(prop_valid_parts),
        prop_batch=jnp.concatenate(prop_batch_parts),
        prop_type=jnp.concatenate(prop_type_parts),
    )
    return props, overflow, gtrunc


def build_proposals(
    cfg: PanopticConfig,
    pos: jnp.ndarray,
    offsets: jnp.ndarray,
    embeds: jnp.ndarray,
    sem_logp: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    subset_seed=None,
) -> Tuple[Proposals, jnp.ndarray]:
    """Run the configured cluster sources and assemble the membership table.

    Membership layout: ``num_sources`` blocks of N rows; block s row i is
    point i's membership in its source-s proposal (or padding).

    Returns (proposals, cluster_overflow, graph_trunc). cluster_overflow
    counts thing rows excluded from any cluster run by the static caps
    (rg_point_cap / ms_point_cap / hd_point_cap); graph_trunc counts
    radius-graph degradation (reverse-slot truncation / cell-key overflow,
    possible under-merge). Both are surfaced in train/eval metrics.
    """
    n = pos.shape[0]
    pred = jnp.argmax(sem_logp, axis=-1).astype(jnp.int32)
    is_stuff = jnp.zeros((n,), bool)
    for c in cfg.stuff_classes:
        is_stuff = is_stuff | (pred == c)
    thing = valid & ~is_stuff
    if cfg.model_family == "embed":
        return _embed_proposals(
            cfg, pos, embeds, pred, batch, thing, subset_seed=subset_seed
        )

    point_blocks = []
    prop_valid_parts = []
    prop_batch_parts = []
    prop_type_parts = []
    id_offset = 0
    tag = 0
    overflow = jnp.zeros((), jnp.int32)
    gtrunc = jnp.zeros((), jnp.int32)

    for src in cfg.rg_sources:
        grow_pos = pos + offsets if src == "vote" else pos
        rg = region_grow_folded(
            grow_pos,
            pred,
            batch,
            thing,
            radius=cfg.cluster_radius,
            max_proposals=cfg.max_props_rg,
            num_classes=cfg.num_classes,
            num_samples=cfg.num_samples,
            min_cluster_size=cfg.min_cluster_size,
            k_neighbors=cfg.rg_k_neighbors,
            cell_cap=cfg.rg_cell_cap,
            point_cap=cfg.resolved_point_cap(n),
            dense_pull=cfg.rg_dense_enabled,
        )
        overflow = overflow + rg.overflow
        gtrunc = gtrunc + rg.graph_trunc
        pid = jnp.where(rg.point_prop >= 0, rg.point_prop + id_offset, -1)
        point_blocks.append(pid)
        prop_valid_parts.append(rg.prop_valid)
        prop_batch_parts.append(rg.prop_batch)
        prop_type_parts.append(jnp.full((cfg.max_props_rg,), tag, jnp.int32))
        id_offset += cfg.max_props_rg
        tag += 1

    if cfg.use_meanshift:
        dense, dvalid, src_row, dropped = pack_by_sample(
            embeds, batch, thing, cfg.num_samples, cfg.ms_point_cap
        )
        overflow = overflow + dropped
        # reference skips samples with <= 3 thing points (meanshift_cluster.py:86)
        counts = jnp.sum(dvalid.astype(jnp.int32), axis=1)
        dvalid = dvalid & (counts > 3)[:, None]
        ms = mean_shift(
            dense, dvalid, bandwidth=cfg.bandwidth, max_seeds=cfg.ms_max_seeds
        )
        lab = jnp.where(
            (ms.labels >= 0) & (ms.labels < cfg.ms_max_clusters), ms.labels, -1
        )
        sample_ids = jnp.arange(cfg.num_samples, dtype=jnp.int32)[:, None]
        dense_pid = jnp.where(lab >= 0, id_offset + sample_ids * cfg.ms_max_clusters + lab, -1)
        # scatter back to flat rows
        flat_pid = jnp.full((n + 1,), -1, jnp.int32)
        tgt = jnp.where(src_row >= 0, src_row, n)
        flat_pid = flat_pid.at[tgt.reshape(-1)].set(dense_pid.reshape(-1), mode="drop")
        point_blocks.append(flat_pid[:n])
        ncl = jnp.minimum(ms.num_clusters, cfg.ms_max_clusters)  # [B]
        cl_ids = jnp.arange(cfg.ms_max_clusters, dtype=jnp.int32)
        ms_valid = (cl_ids[None, :] < ncl[:, None]).reshape(-1)
        ms_batch = jnp.broadcast_to(
            sample_ids, (cfg.num_samples, cfg.ms_max_clusters)
        ).reshape(-1)
        prop_valid_parts.append(ms_valid)
        prop_batch_parts.append(jnp.where(ms_valid, ms_batch, -1))
        prop_type_parts.append(
            jnp.full((cfg.num_samples * cfg.ms_max_clusters,), tag, jnp.int32)
        )

    point_idx = jnp.tile(jnp.arange(n, dtype=jnp.int32), len(point_blocks))
    prop_id = jnp.concatenate(point_blocks)
    member_valid = prop_id >= 0
    prop_valid = jnp.concatenate(prop_valid_parts)
    prop_batch = jnp.concatenate(prop_batch_parts)
    prop_type = jnp.concatenate(prop_type_parts)
    props = Proposals(
        point_idx=jnp.where(member_valid, point_idx, -1),
        prop_id=prop_id,
        member_valid=member_valid,
        prop_valid=prop_valid,
        prop_batch=prop_batch,
        prop_type=prop_type,
    )
    return props, overflow, gtrunc


def scorer_inputs(
    cfg: PanopticConfig,
    props: Proposals,
    coords: jnp.ndarray,
    backbone_feats: jnp.ndarray,
):
    """Assemble the ScoreNet minibatch: one sparse grid whose batch field is
    the proposal id, coords re-centered per proposal (reference gathers
    absolute input coords per cluster, :399-407; re-centering is equivalent
    for the translation-invariant scorer and keeps packed keys in range).

    Coordinates are centered on each proposal's bbox midpoint so the signed
    bit budget (cfg.scorer_bits) covers the full extent; members that still
    fall outside it are dropped from the grid (INVALID_KEY) and counted in
    ``overflow`` - train metrics expose it and tests assert it is 0 for
    realistic proposals (VERDICT r1 #3).

    Returns (scorer_grid, scorer_hier, scorer_feats, row_of_member [M],
    overflow scalar int32).
    """
    bits = cfg.scorer_layout
    # scorer grid rows: one per unique (proposal, voxel) pair; real occupancy
    # is well under the membership-row budget, so cfg.scorer_capacity_mult
    # shrinks the grid (and the ScoreNet conv work on it); drops are counted
    # into ``overflow``
    m = int(props.budget * cfg.scorer_capacity_mult)
    m = -(-m // 256) * 256  # multiple of the winconv tile (ops/winconv.py)
    ok = props.member_valid & (props.prop_id >= 0)
    pt = jnp.maximum(props.point_idx, 0)
    seg = jnp.where(ok, props.prop_id, -1)
    c = jnp.take(coords, pt, axis=0)
    big = jnp.iinfo(jnp.int32).max
    cmin = segment_min(
        jnp.where(ok[:, None], c, big), seg, cfg.total_props, fill=0
    )
    cmax = segment_max(
        jnp.where(ok[:, None], c, -big), seg, cfg.total_props, fill=0
    )
    center = (cmin + cmax) >> 1
    rel = c - jnp.take(center, jnp.maximum(props.prop_id, 0), axis=0)
    half = jnp.array(
        [1 << (bits.bx - 1), 1 << (bits.by - 1), 1 << (bits.bz - 1)],
        jnp.int32,
    )
    in_budget = jnp.all((rel >= -half) & (rel < half), axis=-1)
    overflow = jnp.sum((ok & ~in_budget).astype(jnp.int32))
    grid, inverse = make_grid(seg, rel, ok, bits=bits, capacity=m)
    # members whose unique voxel fell past the grid capacity
    overflow = overflow + jnp.sum(
        (ok & in_budget & (inverse < 0)).astype(jnp.int32)
    )
    feats = jnp.take(backbone_feats, pt, axis=0)
    sf = jnp.zeros((m, backbone_feats.shape[1]), backbone_feats.dtype)
    sf = sf.at[jnp.where(ok & (inverse >= 0), inverse, m)].set(feats, mode="drop")
    hier = build_hierarchy(
        grid, num_down=2, bits=bits, use_bricks=cfg.use_bricks,
        brick_size=cfg.brick_size, brick_capacity_factor=cfg.brick_factor,
        win_maps=cfg.win_enabled,
    )
    return grid, hier, sf, inverse, overflow


def panoptic_losses(
    cfg: PanopticConfig,
    out: PanopticOutput,
    labels_y: jnp.ndarray,
    vote_label: jnp.ndarray,
    instance_labels: jnp.ndarray,
    instance_mask: jnp.ndarray,
    batch: jnp.ndarray,
    valid: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
    epoch: int | None = None,
):
    """Assemble the total loss (reference _compute_loss :552-634).

    ``epoch`` is STATIC; it gates the mask-based IoU targets
    (``cal_iou_based_on_mask`` active iff epoch > its start_epoch,
    reference :594) - None = gate open."""
    losses = {}
    losses["semantic_loss"] = semantic_nll_loss(
        out.semantic_logits, labels_y, valid, class_weights
    )
    total = cfg.w_semantic * losses["semantic_loss"]

    if cfg.has_offset:
        off = offset_loss(out.offset_logits, vote_label, instance_mask & valid)
        losses.update(off)
        total = total + cfg.w_offset_norm * off["offset_norm_loss"]
        total = total + cfg.w_offset_dir * off["offset_dir_loss"]

    disc = discriminative_loss(
        out.embed_logits,
        instance_labels,
        batch,
        instance_mask & valid,
        cfg.num_samples,
        cfg.max_instances,
    )
    losses.update(disc)
    total = total + cfg.w_embed * disc["ins_loss"]

    if out.proposals is not None and out.cluster_scores is not None:
        member_pass = None
        if (
            cfg.cal_iou_based_on_mask
            and out.mask_scores is not None
            and (epoch is None or epoch > cfg.cal_iou_based_on_mask_start_epoch)
        ):
            # reference mask-based IoU (panoptic_losses.py:25-90): members
            # failing the 0.5 sigmoid gate leave the proposal for IoU
            # purposes; members without a scorer row keep counting (the
            # reference scores every member)
            member_pass = jax.nn.sigmoid(out.mask_scores) > 0.5
            if out.mask_row_valid is not None:
                member_pass = member_pass | ~out.mask_row_valid
        ious = instance_iou(
            out.proposals, instance_labels, batch, cfg.num_samples,
            cfg.max_instances, member_pass=member_pass,
        )
        losses["score_loss"] = instance_iou_loss(
            ious,
            out.cluster_scores,
            out.proposals.prop_valid,
            cfg.min_iou_threshold,
            cfg.max_iou_threshold,
        )
        total = total + cfg.w_score * losses["score_loss"]
        if out.mask_scores is not None and cfg.mask_supervise:
            losses["mask_loss"] = mask_loss(
                ious,
                out.proposals,
                jax.nn.sigmoid(out.mask_scores),
                instance_labels,
                cfg.max_instances,
                member_scored=out.mask_row_valid,
            )
            total = total + cfg.w_mask * losses["mask_loss"]
    if out.internal_losses:
        # KPConv-deform regularizers (reference collect_internal_losses,
        # base_model.py:389-402: sum per name, lambda-weighted into the loss)
        for name, val in out.internal_losses.items():
            losses[f"{name}_loss"] = val
            total = total + cfg.lambda_internal_losses * val
    if out.scorer_overflow is not None:
        losses["scorer_overflow"] = out.scorer_overflow.astype(jnp.float32)
    if out.cluster_overflow is not None:
        losses["cluster_overflow"] = out.cluster_overflow.astype(jnp.float32)
    if out.rg_graph_trunc is not None:
        losses["rg_graph_trunc"] = out.rg_graph_trunc.astype(jnp.float32)
    losses["loss"] = total
    return total, losses
