"""Checkpointing with named weight sets.

Reproduces the reference ModelCheckpoint semantics
(``/root/reference/torch_points3d/metrics/model_checkpoint.py:150-313``):
one file holds multiple named weight sets (``latest`` plus
``best_<metric>`` for every tracked metric with its improvement direction),
the optimizer state, the full run config (so eval can rebuild dataset+model
from the checkpoint alone) and the per-stage stats history (whose length
doubles as the resume epoch counter, :230-231).

Serialization: flax.serialization msgpack (arrays + json-able metadata in one
.ckpt file) - safe to load from untrusted sources, unlike pickle. The
optimizer state is stored as a flat leaf list (the trainer re-unflattens it
against the live optax structure on resume). Round-1 checkpoints were
pickled; loading falls back to pickle for those legacy files only (trusted
migration path - pickle executes arbitrary code, so never point
checkpoint_dir at an untrusted legacy .ckpt).
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Any, Dict, List, Optional

import flax.serialization
import jax
import numpy as np

# metric -> comparison direction, mirroring the tracker metric funcs
# (panoptic_tracker_pointgroup_treeins.py:129-130)
DEFAULT_METRIC_FUNCS = {
    "miou": "max",
    "macc": "max",
    "acc": "max",
    "loss": "min",
    "map": "max",
    "cov": "max",
    "wcov": "max",
    "mIPre": "max",
    "mIRec": "max",
    "F1": "max",
}


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class ModelCheckpoint:
    """Single-file checkpoint with `latest` + `best_<metric>` weight sets."""

    def __init__(
        self,
        ckpt_dir: str,
        name: str = "model",
        selection_stage: str = "val",
        metric_funcs: Optional[Dict[str, str]] = None,
        run_config: Optional[Dict[str, Any]] = None,
    ):
        self.ckpt_dir = ckpt_dir
        self.name = name
        self.selection_stage = selection_stage
        self.metric_funcs = dict(metric_funcs or DEFAULT_METRIC_FUNCS)
        os.makedirs(ckpt_dir, exist_ok=True)
        self.path = osp.join(ckpt_dir, name + ".ckpt")
        if osp.exists(self.path):
            with open(self.path, "rb") as f:
                raw = f.read()
            try:
                self._data = flax.serialization.msgpack_restore(raw)
            except Exception:
                # legacy (round-1) pickled checkpoint; see module docstring
                self._data = pickle.loads(raw)
        else:
            self._data = {
                "models": {},
                "optimizer": None,
                "stats": {"train": [], "val": [], "test": []},
                "run_config": run_config or {},
                "best_metrics": {},
            }
        if run_config:
            self._data["run_config"] = run_config

    # ------------------------------------------------------------------
    @property
    def start_epoch(self) -> int:
        return len(self._data["stats"]["train"]) + 1

    @property
    def run_config(self) -> Dict[str, Any]:
        return self._data["run_config"]

    def get_weights(self, name: str = "latest"):
        if name not in self._data["models"]:
            avail = list(self._data["models"])
            raise KeyError(f"weight set {name!r} not found (have {avail})")
        return self._data["models"][name]

    def get_optimizer_state(self):
        return self._data["optimizer"]

    # ------------------------------------------------------------------
    def save_best_models_under_current_metrics(
        self,
        weights: Dict[str, Any],
        optimizer_state: Any,
        stage_metrics: Dict[str, Dict[str, float]],
    ) -> List[str]:
        """Update `latest`, append stats, and refresh `best_<metric>` sets for
        every improved metric of the selection stage. ``weights`` is a pytree
        dict (e.g. {"params": ..., "batch_stats": ..., "bn_momentum": ...}).
        Returns the list of improved metric names."""
        weights = _to_host(weights)
        self._data["models"]["latest"] = weights
        # flat leaf list: msgpack-able regardless of the optax state's
        # NamedTuple nesting; the trainer unflattens against tx.init(params)
        self._data["optimizer"] = [
            np.asarray(l) for l in jax.tree_util.tree_leaves(optimizer_state)
        ]
        for stage, metrics in stage_metrics.items():
            self._data["stats"].setdefault(stage, []).append(
                {k: float(v) for k, v in metrics.items()}
            )
        improved = []
        sel = stage_metrics.get(self.selection_stage, {})
        for metric, value in sel.items():
            direction = None
            for key, d in self.metric_funcs.items():
                if metric.endswith(key):
                    direction = d
                    break
            if direction is None:
                continue
            best_key = f"best_{metric}"
            prev = self._data["best_metrics"].get(metric)
            better = (
                prev is None
                or (direction == "max" and value > prev)
                or (direction == "min" and value < prev)
            )
            if better:
                self._data["best_metrics"][metric] = float(value)
                self._data["models"][best_key] = weights
                improved.append(metric)
        self._flush()
        return improved

    def _flush(self):
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(self._data))
        os.replace(tmp, self.path)
