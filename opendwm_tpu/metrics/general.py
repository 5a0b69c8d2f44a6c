"""General running-mean metric (reference src/dwm/metrics/general_metrics.py)."""

from __future__ import annotations

import numpy as np

from opendwm_tpu.config import register


@register(
    "CustomMeanMetric",
    aliases=("dwm.metrics.general_metrics.CustomMeanMetrics",),
)
class CustomMeanMetric:
    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value):
        arr = np.asarray(value, dtype=np.float64).reshape(-1)
        finite = np.isfinite(arr)
        self.total += float(arr[finite].sum())
        self.count += int(finite.sum())

    def compute(self) -> float:
        return self.total / self.count if self.count else float("nan")

    def reset(self):
        self.total, self.count = 0.0, 0
