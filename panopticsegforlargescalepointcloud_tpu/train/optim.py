"""Config-driven optimizer + LR schedule + gradient accumulation.

The reference instantiates torch optimizers/schedulers from the config tree
(``/root/reference/torch_points3d/models/base_model.py:299-355`` and
``core/schedulers/lr_schedulers.py``) and steps them per the ``update_lr_scheduler_on``
policy; gradient accumulation lives in ``optimize_parameters2``
(``base_model.py:259-285``). Here the same surface maps onto optax:

* scheduler classes (conf/lr_scheduler/*.yaml): ExponentialLR,
  CosineAnnealingLR, MultiStepLR, PolyLR, StepLR - all stepped per *epoch*
  like torch's epoch-wise ``scheduler.step()`` (expressed in optimizer steps
  via steps_per_epoch, staircased);
* optimizers: Adam (default), AdamW, SGD, RMSprop;
* accumulation: ``optax.MultiSteps`` (k mini-batches per optimizer step).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import optax


def make_lr_schedule(
    name: str,
    params: Dict[str, Any],
    base_lr: float,
    steps_per_epoch: int,
) -> Callable:
    """Map a torch-style scheduler config onto an optax schedule (per-epoch
    semantics, staircased on step boundaries)."""
    n = (name or "ExponentialLR").lower()
    p = params or {}
    spe = max(int(steps_per_epoch), 1)
    if "exponential" in n:
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=spe,
            decay_rate=float(p.get("gamma", 0.9885)),
            staircase=True,
        )
    if "cosine" in n:
        return optax.cosine_decay_schedule(
            init_value=base_lr,
            decay_steps=max(int(p.get("T_max", 100)), 1) * spe,
            alpha=float(p.get("eta_min", 0.0)) / max(base_lr, 1e-12),
        )
    if "multistep" in n or "multi_step" in n:
        gamma = float(p.get("gamma", 0.5))
        milestones = [int(m) for m in p.get("milestones", [])]
        return optax.piecewise_constant_schedule(
            init_value=base_lr,
            boundaries_and_scales={m * spe: gamma for m in milestones},
        )
    if "poly" in n:
        return optax.polynomial_schedule(
            init_value=base_lr,
            end_value=0.0,
            power=float(p.get("power", 0.9)),
            transition_steps=max(int(p.get("max_epoch", 150)), 1) * spe,
        )
    if n.startswith("step"):
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=max(int(p.get("step_size", 30)), 1) * spe,
            decay_rate=float(p.get("gamma", 0.5)),
            staircase=True,
        )
    raise ValueError(f"unknown lr scheduler class {name!r}")


def make_optimizer(
    optimizer: str,
    schedule: Callable,
    weight_decay: float = 0.0,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    o = (optimizer or "Adam").lower()
    if o == "adam":
        tx = optax.adam(schedule)
    elif o == "adamw":
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    elif o == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    elif o == "rmsprop":
        tx = optax.rmsprop(schedule)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(grad_accum))
    return tx


def build_from_config(tcfg, steps_per_epoch: int) -> Tuple[optax.GradientTransformation, Callable]:
    """(tx, schedule) from a TrainingConfig."""
    schedule = make_lr_schedule(
        tcfg.scheduler, tcfg.scheduler_params, tcfg.lr, steps_per_epoch
    )
    tx = make_optimizer(
        tcfg.optimizer, schedule, tcfg.weight_decay, tcfg.grad_accum
    )
    return tx, schedule
