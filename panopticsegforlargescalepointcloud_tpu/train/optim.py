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
    if "cyclic" in n:
        # torch CyclicLR triangular mode (reference conf/lr_scheduler/
        # cyclic.yaml: base_lr/max_lr), stepped per epoch like the other
        # schedulers here (reference update_lr_scheduler_on = on_epoch)
        import jax.numpy as jnp

        lo = float(p.get("base_lr", base_lr))
        hi = float(p.get("max_lr", 0.1))
        up = max(int(p.get("step_size_up", 10)), 1)
        mode = str(p.get("mode", "triangular"))
        gamma = float(p.get("gamma", 1.0))

        def cyclic(step):
            e = step // spe
            cycle = e // (2 * up)
            x = jnp.abs(e / up - 2 * cycle - 1)  # 1 -> 0 -> 1 over a cycle
            amp = hi - lo
            if mode == "triangular2":
                amp = amp / (2.0 ** cycle)
            elif mode == "exp_range":
                amp = amp * (gamma ** e)
            return lo + amp * jnp.maximum(0.0, 1.0 - x)

        return cyclic
    if "plateau" in n:
        # ReduceLROnPlateau is metric-driven: the *schedule* is the base lr;
        # the trainer applies the multiplicative plateau scale through
        # PlateauController + apply_plateau_scale (an inject_hyperparams
        # optax.scale stage appended by make_optimizer via needs_plateau)
        return lambda step: base_lr
    raise ValueError(f"unknown lr scheduler class {name!r}")


def needs_plateau(name: str) -> bool:
    return "plateau" in (name or "").lower()


class PlateauController:
    """Host-side ReduceLROnPlateau (reference conf/lr_scheduler/plateau.yaml,
    torch semantics: factor/patience/threshold on a monitored metric). The
    trainer calls :meth:`step` with the validation loss after each val epoch
    and rewrites the plateau scale into opt_state via
    :func:`apply_plateau_scale`."""

    def __init__(self, params: Dict[str, Any] | None, base_lr: float = 1.0):
        p = params or {}
        self.mode = str(p.get("mode", "min"))
        self.factor = float(p.get("factor", 0.1))
        self.patience = int(p.get("patience", 10))
        self.threshold = float(p.get("threshold", 1e-4))
        # torch's min_lr is an ABSOLUTE lr floor; the controller works in
        # multiplicative scale, so floor the scale at min_lr / base_lr
        min_lr = float(p.get("min_lr", 0.0))
        self.min_scale = min_lr / base_lr if base_lr > 0 else 0.0
        self.best: float | None = None
        self.bad = 0
        self.scale = 1.0

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        """Update with the latest monitored metric; returns the current
        cumulative lr scale."""
        if self._improved(metric):
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad = 0
        return self.scale


def apply_plateau_scale(opt_state, scale: float):
    """Rewrite the inject_hyperparams(optax.scale) step_size anywhere in the
    (possibly MultiSteps-nested) opt_state pytree."""
    import jax.numpy as jnp

    def visit(node):
        if (
            hasattr(node, "hyperparams")
            and isinstance(getattr(node, "hyperparams", None), dict)
            and "step_size" in node.hyperparams
            and hasattr(node, "_replace")
        ):
            hp = dict(node.hyperparams)
            hp["step_size"] = jnp.asarray(scale, jnp.float32)
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[visit(v) for v in node])
        if isinstance(node, tuple):
            return tuple(visit(v) for v in node)
        return node

    return visit(opt_state)


def make_optimizer(
    optimizer: str,
    schedule: Callable,
    weight_decay: float = 0.0,
    grad_accum: int = 1,
    plateau_stage: bool = False,
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
    if plateau_stage:
        # multiplicative plateau scale as an injected hyperparam: the trainer
        # rewrites it in opt_state after each validation (apply_plateau_scale)
        tx = optax.chain(
            tx, optax.inject_hyperparams(optax.scale)(step_size=1.0)
        )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(grad_accum))
    return tx


def build_from_config(
    tcfg, steps_per_epoch: int
) -> Tuple[optax.GradientTransformation, Callable, "PlateauController | None"]:
    """(tx, schedule, plateau) from a TrainingConfig. ``plateau`` is a
    PlateauController for ReduceLROnPlateau configs (the trainer feeds it the
    monitored validation loss), else None."""
    schedule = make_lr_schedule(
        tcfg.scheduler, tcfg.scheduler_params, tcfg.lr, steps_per_epoch
    )
    plateau = (
        PlateauController(tcfg.scheduler_params, base_lr=tcfg.lr)
        if needs_plateau(tcfg.scheduler)
        else None
    )
    tx = make_optimizer(
        tcfg.optimizer, schedule, tcfg.weight_decay, tcfg.grad_accum,
        plateau_stage=plateau is not None,
    )
    return tx, schedule, plateau
