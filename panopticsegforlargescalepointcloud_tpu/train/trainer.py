"""Trainer: the orchestration layer (reference ``torch_points3d/trainer.py``).

Wires dataset -> steps -> tracker -> checkpoint:
* epoch loop with the prepare/full phase switch at ``prepare_epoch``
  (two compiled step functions instead of the reference's in-graph gate);
* per-epoch exponential LR decay and BN-momentum scheduling as train-state
  values;
* validation epochs tracking semantic + instance metrics;
* named-weight-set checkpointing with resume;
* falls back to synthetic planted-instance tiles when no dataset files are
  configured (the MockDataset pattern) so the full loop runs anywhere.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.schema import (
    TrainingConfig,
    dataset_spec_from_cfg,
    panoptic_config_from_yaml,
)
from ..data import PanopticFileDataset, collate_tiles, synthetic_tile
from ..eval.confusion import ConfusionMatrix
from ..eval.extract import extract_clusters, proposals_to_numpy
from ..eval.instance_metrics import (
    InstanceAPMeter,
    _Instance,
    compute_acc,
    compute_eval,
)
from ..eval.visualizer import Visualizer
from ..models.pointgroup3heads import PointGroup3HeadsNet
from ..ops.hierarchy import build_hierarchy
from ..utils.timer import StageTimers
from ..utils.wandb_utils import WandbLogger
from .checkpoint import ModelCheckpoint
from .step import (
    TrainState,
    batch_arrays,
    canonicalize,
    init_state,
    make_eval_forward,
    make_train_step,
    prepare_example,
)

log = logging.getLogger(__name__)


class SyntheticTiles:
    """Fallback data source with the PanopticFileDataset sampling API."""

    def __init__(self, spec, rng):
        self.spec = spec
        self._rng = rng

    def sample_train_tile(self, rng):
        return synthetic_tile(
            rng,
            num_classes=self.spec.num_classes,
            stuff_classes=self.spec.stuff_classes,
        )


class Trainer:
    def __init__(
        self,
        cfg: Dict,
        capacity: int = 65536,
        backbone: str = "paper",
        checkpoint_dir: Optional[str] = None,
        **budget_overrides,
    ):
        self.cfg = cfg
        self.pcfg, self.spec, self.tcfg = panoptic_config_from_yaml(
            cfg, backbone=backbone, **budget_overrides
        )
        self.capacity = capacity
        # run_config embedded in checkpoints must rebuild the SAME model:
        # constructor-level knobs (backbone, capacity, budget overrides) are
        # recorded alongside the yaml tree (reference model_checkpoint.py
        # embeds the full run config for eval-from-checkpoint).
        self._run_config = dict(cfg)
        self._run_config["backbone"] = backbone
        self._run_config["budget_overrides"] = dict(budget_overrides)
        data_rc = dict(self._run_config.get("data", {}) or {})
        data_rc.setdefault("voxel_capacity", capacity)
        self._run_config["data"] = data_rc
        self.rng = np.random.default_rng(self.tcfg.seed)

        data_cfg = cfg.get("data", {})
        files = data_cfg.get("files", {}) or {}
        # config-driven transform stacks (reference data yaml lists,
        # conf/data/panoptic/treeins_rad8.yaml:17-82); None -> paper defaults
        ds_kwargs = dict(
            grid_size=float(data_cfg.get("grid_size", 0.2)),
            radius=float(data_cfg.get("radius", 8)),
            processed_dir=data_cfg.get("processed_dir"),
            sampling_format=str(data_cfg.get("sampling_format", "cylinder")),
            train_transforms=data_cfg.get("train_transforms"),
            test_transforms=(data_cfg.get("val_transform")
                             or data_cfg.get("test_transform")
                             or data_cfg.get("test_transforms")),
            pre_collate_transform=data_cfg.get("pre_collate_transform"),
            rng=self.rng,
        )
        if files.get("train"):
            self.dataset = PanopticFileDataset(
                self.spec, files["train"], **ds_kwargs)
            self.val_dataset = (
                PanopticFileDataset(self.spec, files["val"], **ds_kwargs)
                if files.get("val")
                else self.dataset
            )
        else:
            log.warning("no dataset files configured - using synthetic tiles")
            self.dataset = SyntheticTiles(self.spec, self.rng)
            self.val_dataset = self.dataset

        self.model = PointGroup3HeadsNet(self.pcfg)
        # data-parallel mesh (SURVEY §2.9: tiles are the batch axis; grads
        # psum over ICI). batch_size is per device.
        nd = self.tcfg.num_devices
        nd = len(jax.devices()) if nd == 0 else nd
        if nd > 1 and len(jax.devices()) < nd:
            raise RuntimeError(
                f"training.num_devices={nd} but only {len(jax.devices())} "
                f"jax devices are visible"
            )
        self.num_devices = nd
        self.mesh = None
        if nd > 1:
            from ..parallel import make_mesh

            self.mesh = make_mesh(jax.devices()[:nd])
            log.info("data-parallel over %d devices (%s)", nd, jax.devices()[0].platform)
        global_batch = self.tcfg.batch_size * nd
        steps_per_epoch = max(self.tcfg.samples_per_epoch // global_batch, 1)
        self.steps_per_epoch = steps_per_epoch
        # optimizer + lr schedule + grad accumulation from the config groups
        # (reference base_model.py:299-355, conf/lr_scheduler/*)
        from .optim import build_from_config

        self.tx, self.lr_schedule, self.plateau = build_from_config(self.tcfg, steps_per_epoch)

        cw = None
        if self.tcfg.use_class_weights and hasattr(self.dataset, "class_weights"):
            cw = self.dataset.class_weights()
            log.info("weighted semantic NLL, class weights %s", np.round(cw, 3))
        if self.mesh is not None:
            from ..parallel import make_parallel_train_step

            self._prepare_step = make_parallel_train_step(
                self.pcfg, self.model, self.tx, self.mesh,
                with_clustering=False, grad_clip_value=self._clip(),
                class_weights=cw,
            )
            self._full_steps = {}

            def _build_full(epoch):
                return make_parallel_train_step(
                    self.pcfg, self.model, self.tx, self.mesh,
                    with_clustering=True, grad_clip_value=self._clip(),
                    class_weights=cw, epoch=epoch,
                )

            self._build_full = _build_full
        else:
            self._prepare_step = make_train_step(
                self.pcfg, self.model, self.tx, with_clustering=False,
                grad_clip_value=self._clip(), class_weights=cw,
            )
            self._full_steps = {}

            def _build_full(epoch):
                return make_train_step(
                    self.pcfg, self.model, self.tx, with_clustering=True,
                    grad_clip_value=self._clip(), class_weights=cw,
                    epoch=epoch,
                )

            self._build_full = _build_full
        # in-training validation must see the SAME epoch-gated mask behavior
        # as the train step (the plateau scheduler consumes this val metric);
        # cached per gate state like _full_step_for
        self._eval_fwds = {}
        self._eval_fwd_basic = make_eval_forward(
            self.pcfg, self.model, with_clustering=False
        )

        example = self._collate_one_device()
        arrays = batch_arrays(example)
        db, hier = prepare_example(arrays, self.pcfg.num_down)
        self.state = init_state(
            self.pcfg, self.model, self.tx, db, hier,
            jax.random.PRNGKey(self.tcfg.seed), self.tcfg.bn_momentum,
        )
        wandb_cfg = cfg.get("training", {}).get("wandb", {}) or {}
        tb_cfg = cfg.get("training", {}).get("tensorboard", {}) or {}
        self.logger = WandbLogger(
            enabled=bool(wandb_cfg.get("log", False)),
            project=str(wandb_cfg.get("project", "panoptic-tpu")),
            config=cfg,
            run_dir=checkpoint_dir or self.tcfg.checkpoint_dir or ".",
            tensorboard=bool(tb_cfg.get("log", False)),
        )
        self.timers = StageTimers()
        viz_cfg = cfg.get("visualization", {}) or {}
        self.visualizer = (
            Visualizer(
                out_dir=str(viz_cfg.get("out_dir", "viz")),
                num_samples_per_epoch=int(viz_cfg.get("num_samples_per_epoch", 2)),
            )
            if viz_cfg.get("activate", False)
            else None
        )
        # async input pipeline (reference DataLoader workers,
        # base_dataset.py:252-262); 0 workers = synchronous
        self._prefetcher = None
        if self.tcfg.num_workers > 0:
            from ..data.prefetch import BatchPrefetcher

            self._prefetcher = BatchPrefetcher(
                self._make_batch,
                seed=self.tcfg.seed,
                num_workers=self.tcfg.num_workers,
                prefetch=max(2 * self.tcfg.num_workers, 4),
            )
        self.start_epoch = 1
        self.checkpoint = None
        if checkpoint_dir or self.tcfg.checkpoint_dir:
            self.checkpoint = ModelCheckpoint(
                checkpoint_dir or self.tcfg.checkpoint_dir,
                run_config=self._run_config,
            )
            if "latest" in self.checkpoint._data["models"]:
                self._load_weights("latest")
                self.start_epoch = self.checkpoint.start_epoch
                log.info("resumed from epoch %d", self.start_epoch)
        if self.mesh is not None:
            from ..parallel import replicate

            self.state = replicate(self.mesh, self.state)

    def _clip(self):
        gc = self.tcfg.grad_clip
        return None if gc is None or gc <= 0 else float(gc)

    def _load_weights(self, name: str):
        w = self.checkpoint.get_weights(name)
        self.state = self.state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, w["params"]),
            batch_stats=jax.tree_util.tree_map(jnp.asarray, w["batch_stats"]),
        )
        opt = self.checkpoint.get_optimizer_state()
        if opt is not None:
            target = jax.tree_util.tree_structure(self.state.opt_state)
            leaves = jax.tree_util.tree_leaves(opt)
            self.state = self.state.replace(
                opt_state=jax.tree_util.tree_unflatten(
                    target, [jnp.asarray(l) for l in leaves]
                ),
                step=jnp.asarray(
                    (self.checkpoint.start_epoch - 1) * self.steps_per_epoch,
                    jnp.int32,
                ),
            )

    # ------------------------------------------------------------------
    def _collate_one_device(self, rng=None):
        rng = rng if rng is not None else self.rng
        tiles = [
            self.dataset.sample_train_tile(rng)
            for _ in range(self.tcfg.batch_size)
        ]
        return collate_tiles(
            tiles, capacity=self.capacity, num_tiles=self.tcfg.batch_size
        )

    def _make_batch(self, rng):
        if self.mesh is None:
            return self._collate_one_device(rng)
        from ..data import stack_device_batches

        return stack_device_batches(
            [self._collate_one_device(rng) for _ in range(self.num_devices)]
        )

    def _next_batch(self):
        if self._prefetcher is not None:
            return next(self._prefetcher)
        return self._make_batch(self.rng)

    def train(self, epochs: Optional[int] = None, batches_per_epoch: Optional[int] = None):
        epochs = epochs or self.tcfg.epochs
        nb = batches_per_epoch or self.steps_per_epoch
        # debugging knobs (reference trainer.py:284-294: early_break stops
        # after one batch; profiling caps the batch count)
        dbg = self.cfg.get("debugging", {}) or {}
        if dbg.get("early_break"):
            nb = 1
            epochs = min(epochs, self.start_epoch)
        elif dbg.get("profiling"):
            nb = min(nb, int(dbg.get("num_batches", 50)))
        for epoch in range(self.start_epoch, epochs + 1):
            t0 = time.time()
            # BN momentum step decay (reference bn_scheduler step_decay policy:
            # momentum = clip(bn_momentum * bn_decay**(epoch // decay_step)))
            mom = max(
                self.tcfg.bn_momentum
                * (self.tcfg.bn_decay ** (epoch // max(self.tcfg.bn_decay_every, 1))),
                self.tcfg.bn_clip,
            )
            self.state = self.state.replace(
                bn_momentum=jnp.asarray(mom, jnp.float32)
            )
            metrics = self._train_epoch(epoch, nb)
            log.info(
                "epoch %d done in %.1fs: %s",
                epoch,
                time.time() - t0,
                {k: round(v, 4) for k, v in metrics.items()},
            )
            stage_metrics = {"train": metrics}
            if self.visualizer is not None:
                self.visualizer.begin_epoch(epoch)
            if epoch % self.tcfg.eval_frequency == 0:
                val = self.eval_epoch(epoch, num_batches=max(nb // 10, 1))
                stage_metrics["val"] = val
                log.info("val: %s", {k: round(v, 4) for k, v in val.items()})
                if self.plateau is not None:
                    # ReduceLROnPlateau on the monitored validation loss
                    monitored = val.get("loss", val.get("semantic_loss"))
                    if monitored is not None:
                        from .optim import apply_plateau_scale

                        scale = self.plateau.step(float(monitored))
                        self.state = self.state.replace(
                            opt_state=apply_plateau_scale(
                                self.state.opt_state, scale
                            )
                        )
            if self.checkpoint:
                weights = {
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                }
                self.checkpoint.save_best_models_under_current_metrics(
                    weights, self.state.opt_state, stage_metrics
                )
        return self.state

    def _full_step_for(self, epoch: int):
        """Full-phase step, cached by the *_start_epoch gate state: the
        reference flips mask behaviors when epoch crosses their start epochs
        (PointGroup3heads.py:430,594); each distinct gate combination is one
        extra compilation, at most 4 per run."""
        p = self.pcfg
        key = (
            p.mask_supervise and p.use_mask_filter_score_feature
            and epoch > p.use_mask_filter_score_feature_start_epoch,
            p.mask_supervise and p.cal_iou_based_on_mask
            and epoch > p.cal_iou_based_on_mask_start_epoch,
        )
        if key not in self._full_steps:
            self._full_steps[key] = self._build_full(epoch)
        return self._full_steps[key]

    def _eval_fwd_for(self, epoch: int):
        """Instance-eval forward with the *_start_epoch gates in the same
        state as the training step at this epoch (same keying as
        _full_step_for)."""
        p = self.pcfg
        key = (
            p.mask_supervise and p.use_mask_filter_score_feature
            and epoch > p.use_mask_filter_score_feature_start_epoch,
            p.mask_supervise and p.cal_iou_based_on_mask
            and epoch > p.cal_iou_based_on_mask_start_epoch,
        )
        if key not in self._eval_fwds:
            self._eval_fwds[key] = make_eval_forward(
                self.pcfg, self.model, with_clustering=True, epoch=epoch
            )
        return self._eval_fwds[key]

    def _train_epoch(self, epoch: int, num_batches: int) -> Dict[str, float]:
        step = (
            self._full_step_for(epoch)
            if epoch > self.pcfg.prepare_epoch
            else self._prepare_step
        )
        agg: Dict[str, float] = {}
        find_nbr = bool(
            (self.cfg.get("debugging", {}) or {}).get("find_neighbour_dist")
        )
        nbr_stats: Dict[str, float] = {}
        for bi in range(num_batches):
            with self.timers.time("data"):
                vb = self._next_batch()
                if find_nbr and bi == 0:
                    # FIND_NEIGHBOUR_DIST diagnostic (reference
                    # utils/debugging_vars.py): neighbor counts at the
                    # clustering radius on the first batch of the epoch
                    from ..utils.debugging import neighbour_count_stats

                    flat = vb if vb.pos.ndim == 2 else type(vb)(
                        *[a[0] for a in vb]
                    )
                    stats = neighbour_count_stats(
                        flat.pos, flat.batch, flat.mask,
                        self.pcfg.cluster_radius, self.pcfg.rg_k_neighbors,
                    )
                    log.info(
                        "neighbour dist @ r=%.3g k=%d: %s",
                        self.pcfg.cluster_radius, self.pcfg.rg_k_neighbors,
                        {k: round(v, 3) for k, v in stats.items()},
                    )
                    nbr_stats = stats
                arrays = batch_arrays(vb)
                if self.mesh is not None:
                    from ..parallel import shard_batch

                    arrays = shard_batch(self.mesh, tuple(arrays))
            with self.timers.time("step"):
                self.state, metrics = step(self.state, arrays)
                metrics = {k: float(v) for k, v in metrics.items()}
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
        out = {k: v / num_batches for k, v in agg.items()}
        out.update(nbr_stats)
        opt_steps = int(jax.device_get(self.state.step)) // max(self.tcfg.grad_accum, 1)
        out["lr"] = float(self.lr_schedule(opt_steps))
        out.update({f"time_{k}": v for k, v in self.timers.summary().items()})
        self.logger.log({f"train_{k}": v for k, v in out.items()}, step=int(self.state.step))
        return out

    # ------------------------------------------------------------------
    def _val_batches(self, num_batches: int):
        """Yield validation VoxelBatches.

        With ``training.full_val`` and a file-backed val split, walks the
        WHOLE split as a deterministic PCA-grid tiling (the reference's
        ``_test_epoch`` over the val loader, trainer.py:233-276) so the
        ``best_<metric>`` checkpoint selection is stable and reproducible.
        Otherwise samples ``num_batches`` random val-style tiles (quick eval).
        """
        if self.tcfg.full_val and hasattr(self.val_dataset, "test_tiles"):
            tiles = []
            for fi in range(len(self.val_dataset.files)):
                tiles.extend(t for t, _ in self.val_dataset.test_tiles(fi))
            for i in range(0, len(tiles), self.tcfg.batch_size):
                yield collate_tiles(
                    tiles[i : i + self.tcfg.batch_size],
                    capacity=self.capacity,
                    num_tiles=self.tcfg.batch_size,
                )
            return
        for _ in range(num_batches):
            tiles = [
                self.val_dataset.sample_train_tile(self.rng)
                for _ in range(self.tcfg.batch_size)
            ]
            yield collate_tiles(
                tiles, capacity=self.capacity, num_tiles=self.tcfg.batch_size
            )

    def eval_epoch(
        self, epoch: int, num_batches: int = 10, with_instances: Optional[bool] = None
    ) -> Dict[str, float]:
        if with_instances is None:
            with_instances = epoch > self.pcfg.prepare_epoch
        fwd = self._eval_fwd_for(epoch) if with_instances else self._eval_fwd_basic
        eval_params, eval_stats = self.state.params, self.state.batch_stats
        if self.mesh is not None:
            # the eval forward is single-device; pull a host copy of the
            # replicated weights rather than mixing shardings under jit
            eval_params = jax.device_get(eval_params)
            eval_stats = jax.device_get(eval_stats)
        cm = ConfusionMatrix(self.pcfg.num_classes)
        inst_metrics: List[tuple] = []
        ap_meter = InstanceAPMeter()
        scan_offset = 0
        for bi, vb in enumerate(self._val_batches(num_batches)):
            # embed family: per-(epoch, batch) counter resamples the random
            # feature subsets per forward (reference torch.multinomial parity)
            db, out = fwd(eval_params, eval_stats, batch_arrays(vb),
                          subset_seed=epoch * 100003 + bi)
            mask = np.asarray(db.grid.mask)
            y = np.asarray(db.y)
            pred = np.asarray(jnp.argmax(out.semantic_logits, -1))
            ok = mask & (y >= 0)
            cm.count_predicted_batch(y[ok], pred[ok])
            if self.visualizer is not None:
                self.visualizer.maybe_save(
                    np.asarray(db.pos), mask, y, pred,
                    instance_labels=np.asarray(db.instance_labels),
                    offsets=np.asarray(out.offset_logits),
                    embeds=np.asarray(out.embed_logits),
                )
            if with_instances and out.proposals is not None:
                props = proposals_to_numpy(out.proposals)
                scores = np.asarray(out.cluster_scores) if out.cluster_scores is not None else None
                clusters, kept_ids = extract_clusters(
                    props, scores, len(mask),
                    nms_threshold=self.pcfg.nms_threshold,
                    min_cluster_points=self.pcfg.min_cluster_points,
                    min_score=self.pcfg.min_score,
                )
                if clusters:
                    inst = np.asarray(db.instance_labels)
                    batch = np.asarray(db.grid.batch)
                    ninst = int((np.unique(inst * (batch >= 0))).max())
                    acc = compute_acc(clusters, pred, inst, y, batch, max(ninst, 1))
                    ev = compute_eval(
                        clusters, pred, inst, y, batch,
                        self.pcfg.num_classes, self.spec.thing_classes,
                    )
                    inst_metrics.append(acc + ev)
                    # VOC AP over accumulated scans (tracker 'map' metric)
                    preds_i = [
                        _Instance(
                            classname=int(np.bincount(pred[c]).argmax()),
                            score=float(scores[k]) if scores is not None else -1.0,
                            indices=c,
                            scan_id=int(batch[c[0]]) + scan_offset,
                        )
                        for c, k in zip(clusters, kept_ids)
                    ]
                    gts_i = []
                    for s_id in np.unique(batch[batch >= 0]):
                        smask = batch == s_id
                        for g in np.unique(inst[smask]):
                            if g <= 0:
                                continue
                            idxs = np.where((inst == g) & smask)[0]
                            gts_i.append(
                                _Instance(
                                    classname=int(np.bincount(np.maximum(y[idxs], 0)).argmax()),
                                    score=-1.0,
                                    indices=idxs,
                                    scan_id=int(s_id) + scan_offset,
                                )
                            )
                    ap_meter.add(preds_i, gts_i)
                    scan_offset += int(batch.max()) + 1
        out_metrics = {
            "miou": cm.get_average_intersection_union(),
            "acc": cm.get_overall_accuracy(),
            "macc": cm.get_mean_class_accuracy(),
        }
        if inst_metrics:
            arr = np.asarray(inst_metrics)
            for i, k in enumerate(
                ["pos", "neg", "Iacc", "cov", "wcov", "mIPre", "mIRec", "F1"]
            ):
                out_metrics[k] = float(arr[:, i].mean())
            _, _, aps = ap_meter.eval(0.5)
            if aps:
                out_metrics["map"] = float(np.mean(list(aps.values())))
        return out_metrics
