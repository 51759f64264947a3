"""Full-scene evaluator: eval.py's engine (reference Trainer._test_epoch +
PanopticTracker test path + finalise, SURVEY.md §3.3).

Per test file: deterministic cylinder tiling -> jitted forward per tile ->
semantic vote accumulation + NMS'd clusters -> block merging into the raw
cloud -> finalise (full-res projection, stuff masking, distance cutoff,
min-size filter) -> PLY exports + final_eval PQ report.
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..data import PanopticFileDataset, collate_tiles
from ..data.ply import to_eval_ply, to_ins_ply
from ..eval.extract import extract_clusters
from ..eval.merge import SceneAccumulator
from ..eval.panoptic_quality import final_eval
from ..models.pointgroup3heads import PanopticConfig
from ..train.step import batch_arrays, make_eval_forward

log = logging.getLogger(__name__)


def eval_tile_capacity(data_cfg) -> int:
    """Per-TILE row budget for eval/forward: data yamls size
    ``eval_voxel_capacity`` to one tile (training's ``voxel_capacity`` covers
    the whole multi-tile batch); a tile never needs more rows than the whole
    training batch, so a small ``voxel_capacity`` override (smoke runs)
    shrinks eval too. Warns when that clamp actually binds - a run trained
    with a deliberately tight voxel_capacity would otherwise silently
    truncate eval tiles the data yaml explicitly sized larger (advisor r4)."""
    vcap = int(data_cfg.get("voxel_capacity", 65536))
    want = int(data_cfg.get("eval_voxel_capacity") or vcap)
    if want > vcap:
        log.warning(
            "eval_voxel_capacity=%d clamped to training voxel_capacity=%d: "
            "tiles larger than %d rows will be truncated (overflow counters "
            "report it); retrain or raise voxel_capacity to honor the "
            "configured eval tile size",
            want, vcap, vcap,
        )
    return min(want, vcap)


class FullSceneEvaluator:
    def __init__(
        self,
        pcfg: PanopticConfig,
        model,
        params,
        batch_stats,
        dataset: PanopticFileDataset,
        capacity: int = 65536,
        mesh=None,
        tiles_per_dispatch: int = 1,
    ):
        """``mesh``: optional jax.sharding.Mesh - tiles are then batched one
        per device through a single sharded forward (parallel/mesh.py:
        make_parallel_eval_forward); block merging stays on host in tile
        order, so results match the sequential path bit-for-bit.

        ``tiles_per_dispatch``: single-device tile batching - g tiles ride
        one forward as a g-sample batch (the same multi-sample shapes
        training uses), amortizing per-dispatch latency and phase bubbles
        across tiles. Per-tile results match g=1 exactly while the proposal
        budget does not bind: clustering is per-sample by construction
        (folded batch ids in region grow, per-sample mean-shift packs), the
        shared region-grow budget is scaled by g, proposals are split by
        ``prop_batch`` before host NMS/merge, and embed-family feature
        subsets draw from per-tile counters (each tile uses the same counter
        it would get at g=1). Mutually exclusive with ``mesh``."""
        import dataclasses

        assert pcfg.num_samples == 1, "full-scene eval runs tiles one by one"
        g = max(int(tiles_per_dispatch), 1)
        assert mesh is None or g == 1, "tiles_per_dispatch needs mesh=None"
        self.pcfg = pcfg
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.dataset = dataset
        self.capacity = capacity
        self.mesh = mesh
        self.group = g
        if mesh is not None:
            from ..parallel import make_parallel_eval_forward, replicate

            self._pfwd = make_parallel_eval_forward(pcfg, model, mesh)
            self.params = replicate(mesh, self.params)
            self.batch_stats = replicate(mesh, self.batch_stats)
        else:
            fcfg = pcfg
            if g > 1:
                # global (whole-batch) clustering budgets scale with the
                # tile count; per-sample budgets (ms/hd point caps + cluster
                # counts) already multiply through num_samples
                fcfg = dataclasses.replace(
                    pcfg,
                    num_samples=g,
                    max_props_rg=pcfg.max_props_rg * g,
                    # resolve the PER-TILE cap first and pass g times it as an
                    # absolute budget: resolving the fraction against the
                    # g-times-larger row count would round up only once, up to
                    # (g-1)*2047 rows tighter than g independent per-tile caps
                    # - near occupancy boundaries grouped eval could overflow
                    # where sequential eval would not (advisor r4)
                    rg_point_cap=(pcfg.resolved_point_cap(capacity) * g
                                  if pcfg.rg_point_cap else 0),
                )
            self._fwd = make_eval_forward(fcfg, model, with_clustering=True)

    def run(
        self,
        out_dir: str = ".",
        ply_output: bool = True,
        th_merge: Optional[float] = None,
        voting_runs: int = 1,
    ) -> List[Dict[str, float]]:
        os.makedirs(out_dir, exist_ok=True)
        th = 0.1 if th_merge is None else th_merge
        reports = []
        for fi in range(len(self.dataset.files)):
            if self.dataset.keep_raw and self.dataset.raw_clouds:
                raw = self.dataset.raw_clouds[fi]
                remap = None
            else:
                # origin_id provenance points into the RAW cloud rows; when
                # only the subsampled cloud is kept, remap those ids onto
                # subsampled rows so the accumulator indexes correctly
                # (VERDICT r1 weak #6).
                raw = self.dataset.clouds[fi]
                src = raw["origin_id"].astype(np.int64)
                remap = np.full(int(src.max()) + 2, -1, np.int64)
                remap[src] = np.arange(len(src), dtype=np.int64)
            acc = SceneAccumulator(raw["pos"], self.pcfg.num_classes)
            runs = max(int(voting_runs), 1)
            for vote in range(runs):
                # each voting run re-tiles with a shifted grid origin so the
                # votes come from genuinely different cylinder decompositions
                # (reference voting interacts with its random transforms;
                # VERDICT r1 weak #5)
                tiles = self.dataset.test_tiles(fi, grid_shift=vote / runs)
                if vote == 0:
                    log.info("file %d: %d tiles x %d votes", fi, len(tiles), runs)
                if self.mesh is not None:
                    self._process_tiles_mesh(
                        acc, tiles, th, remap, seed_base=vote * len(tiles)
                    )
                else:
                    # one-deep pipeline: dispatch group t's forward (async),
                    # then host-merge group t-1 while the device runs -
                    # collate/merge/extract hide under device compute.
                    # groups of `self.group` tiles share one dispatch (the
                    # last group pads by repeating its final tile; padded
                    # samples are computed but never accumulated)
                    g = self.group
                    pending = None
                    for start in range(0, len(tiles), g):
                        group = tiles[start : start + g]
                        padded = group + [group[-1]] * (g - len(group))
                        vb = collate_tiles(
                            [t for t, _ in padded],
                            capacity=self.capacity * g, num_tiles=g,
                        )
                        # embed family: per-(vote, TILE) counters - each tile
                        # of the group draws the exact subsets it would get
                        # from the g=1 sequential path (padded repeat samples
                        # draw past-the-end counters; never accumulated)
                        db, out = self._fwd(
                            self.params, self.batch_stats, batch_arrays(vb),
                            subset_seed=vote * len(tiles) + start
                            + np.arange(g, dtype=np.int32),
                        )
                        if pending is not None:
                            self._accumulate_device(acc, *pending, th, remap)
                        pending = (db, out, [ids for _, ids in group])
                    if pending is not None:
                        self._accumulate_device(acc, *pending, th, remap)
            sem, ins = acc.finalise(
                stuff_classes=self.pcfg.stuff_classes,
                distance_cutoff=1.0,
                min_instance_size=10,
            )
            gt_sem = raw["y"]
            gt_ins = raw["instance_labels"]
            if ply_output:
                # reference-exporter-compatible files (ASCII, int16 preds/gt -
                # datasets/panoptic/treeins.py:59-75; used at tracker finalise
                # :603-607 and :665-669) + the colored instance dump (:688-693)
                to_eval_ply(
                    osp.join(out_dir, f"Semantic_results_forEval_{fi}.ply"),
                    raw["pos"], sem, gt_sem,
                )
                to_eval_ply(
                    osp.join(out_dir, f"Instance_Results_forEval{fi}.ply"),
                    raw["pos"], ins, gt_ins,
                )
                to_ins_ply(
                    osp.join(out_dir, f"Instance_results_withColor_{fi}.ply"),
                    raw["pos"], ins,
                )
            report = final_eval(
                sem,
                ins,
                gt_sem,
                gt_ins,
                num_classes_raw=self.pcfg.num_classes,
                thing_classes_raw=self.dataset.spec.thing_classes,
                stuff_classes_raw=self.dataset.spec.stuff_classes,
                output_file=osp.join(out_dir, f"Evaluation_{fi}"),
            )
            report["vote_miou"] = acc.vote_miou(gt_sem, self.pcfg.num_classes)
            reports.append(report)
            log.info(
                "file %d: PQ=%.3f F1=%.3f mIoU=%.3f",
                fi, report["meanPQ"], report["F1"], report["mIoU"],
            )
        return reports

    def _process_tile(self, acc, tile, tile_full_ids, th, remap=None,
                      subset_seed=0):
        assert self.group == 1
        vb = collate_tiles([tile], capacity=self.capacity, num_tiles=1)
        db, out = self._fwd(self.params, self.batch_stats, batch_arrays(vb),
                            subset_seed=subset_seed)
        self._accumulate_device(acc, db, out, [tile_full_ids], th, remap)

    def _accumulate_device(self, acc, db, out, ids_list, th, remap=None):
        """Pull one dispatch's outputs to host and accumulate its tiles in
        order. ``ids_list``: per-tile full-cloud index arrays - one entry per
        REAL tile in the dispatch (padded repeat samples are skipped)."""
        import jax

        # ONE device_get for everything this dispatch needs on the host:
        # each np.asarray is a separate transfer round trip, and over a
        # remote device link (axon tunnel; same shape as a disaggregated
        # serving host) per-call latency x 9 arrays was a visible slice of
        # the per-tile wall
        fetch = {
            "mask": db.grid.mask,
            "batch": db.grid.batch,
            "origin": db.origin_id,
            "sem": out.semantic_logits,
        }
        if out.proposals is not None:
            p = out.proposals
            fetch["props"] = dict(
                point_idx=p.point_idx, prop_id=p.prop_id,
                member_valid=p.member_valid, prop_valid=p.prop_valid,
                prop_batch=p.prop_batch, prop_type=p.prop_type,
            )
        if out.cluster_scores is not None:
            fetch["scores"] = out.cluster_scores
        host = jax.device_get(fetch)
        props = host.get("props")
        for ti, tile_full_ids in enumerate(ids_list):
            sel = host["mask"] & (host["batch"] == ti)
            props_ti = props
            if props is not None and len(ids_list) > 1:
                # restrict the flat membership table + proposal axis to this
                # tile's proposals (members inherit via their prop_id)
                pid = props["prop_id"]
                safe = np.maximum(pid, 0)
                mem = (
                    props["member_valid"]
                    & (pid >= 0)
                    & (props["prop_batch"][safe] == ti)
                )
                props_ti = dict(
                    point_idx=props["point_idx"],
                    prop_id=np.where(mem, pid, -1),
                    member_valid=mem,
                    prop_valid=props["prop_valid"] & (props["prop_batch"] == ti),
                    prop_batch=props["prop_batch"],
                    prop_type=props["prop_type"],
                )
            self._accumulate(
                acc,
                sel,
                host["origin"],
                host["sem"],
                props_ti,
                host.get("scores"),
                tile_full_ids,
                th,
                remap,
            )

    def _process_tiles_mesh(self, acc, tiles, th, remap=None, seed_base=0):
        """One tile per mesh device through the sharded forward; host merge
        runs in tile order (same results as the sequential path)."""
        import jax.numpy as jnp

        from ..parallel import shard_batch

        d = int(np.prod(self.mesh.devices.shape))
        for start in range(0, len(tiles), d):
            group = tiles[start : start + d]
            padded = group + [group[-1]] * (d - len(group))
            per_tile = [
                batch_arrays(collate_tiles([t], capacity=self.capacity, num_tiles=1))
                for t, _ in padded
            ]
            stacked = tuple(
                jnp.stack([a[i] for a in per_tile]) for i in range(len(per_tile[0]))
            )
            # per-(vote, tile) subset counters, same numbering as sequential
            seeds = jnp.asarray(
                [seed_base + start + i for i in range(d)], jnp.int32
            )
            (stacked, seeds) = shard_batch(self.mesh, (stacked, seeds))
            res = self._pfwd(self.params, self.batch_stats, stacked, seeds)
            import jax

            res = jax.device_get(res)  # one transfer for the whole group
            for di, (_, tile_full_ids) in enumerate(group):
                props_np = dict(
                    point_idx=res["point_idx"][di],
                    prop_id=res["prop_id"][di],
                    member_valid=res["member_valid"][di],
                    prop_valid=res["prop_valid"][di],
                    prop_batch=res["prop_batch"][di],
                    prop_type=res["prop_type"][di],
                )
                # NaN sentinel = the model has no scorer; restore the
                # sequential path's scores=None (extract_clusters early-exit:
                # all proposals, no NMS/score filtering)
                tile_scores = res["scores"][di]
                if np.all(np.isnan(tile_scores)):
                    tile_scores = None
                self._accumulate(
                    acc,
                    res["mask"][di],
                    res["origin"][di],
                    res["sem"][di],
                    props_np,
                    tile_scores,
                    tile_full_ids,
                    th,
                    remap,
                )

    def _accumulate(
        self, acc, mask, origin, sem, props_np, scores_np, tile_full_ids, th, remap
    ):
        if remap is not None:
            origin = remap[np.clip(origin, 0, len(remap) - 1)]
            tile_full_ids = remap[np.clip(tile_full_ids, 0, len(remap) - 1)]
        row_to_sub = np.cumsum(mask) - 1  # canonical row -> position in valid subset

        clusters_rows, kept = [], []
        if props_np is not None:
            clusters_rows, kept = extract_clusters(
                props_np,
                scores_np,
                len(mask),
                nms_threshold=self.pcfg.nms_threshold,
                min_cluster_points=self.pcfg.min_cluster_points,
                min_score=self.pcfg.min_score,
            )
        clusters_sub = [row_to_sub[c] for c in clusters_rows]
        if kept and scores_np is not None:
            kept_scores = np.asarray([scores_np[k] for k in kept])
        else:
            kept_scores = None
        acc.add_tile(
            origin[mask],
            sem[mask],
            tile_full_ids,
            clusters_sub,
            kept_scores,
            th_merge=th,
        )
