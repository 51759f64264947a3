"""Evaluation: confusion matrix, instance metrics, PQ suite, block merging."""

from .confusion import ConfusionMatrix  # noqa: F401
from .panoptic_quality import final_eval  # noqa: F401
from .instance_metrics import (  # noqa: F401
    compute_acc,
    compute_eval,
    InstanceAPMeter,
    voc_ap,
)
from .merge import SceneAccumulator, block_merging  # noqa: F401
from .visualizer import Visualizer  # noqa: F401
