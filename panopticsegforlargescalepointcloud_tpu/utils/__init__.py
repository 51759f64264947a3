"""Shared utilities: timing, logging, optional W&B."""

from .timer import Timer, StageTimers  # noqa: F401
from .wandb_utils import WandbLogger  # noqa: F401
