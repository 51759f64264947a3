"""Per-phase wall-clock timing (the reference tracked forward /
offset-cluster / embed-cluster time via module globals,
``torch_points3d/models/panoptic/minkowski.py:32-35`` and ``utils/timer.py``;
here it is a first-class object the trainer owns)."""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class Timer:
    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.total += time.perf_counter() - self._t0
            self.count += 1
            self._t0 = None

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


class StageTimers:
    """Named timers: input / forward / cluster / merge / ..."""

    def __init__(self):
        self._timers: Dict[str, Timer] = defaultdict(Timer)

    @contextmanager
    def time(self, name: str):
        t = self._timers[name]
        t.start()
        try:
            yield
        finally:
            t.stop()

    def summary(self) -> Dict[str, float]:
        return {k: v.mean for k, v in self._timers.items()}

    def totals(self) -> Dict[str, float]:
        return {k: v.total for k, v in self._timers.items()}
