"""Per-request stage metrics (SURVEY.md §5: tracing/observability plan).

The reference has no observability beyond wall-clock prints in research
scripts (``research_scripts/evaluation.py:98-104``); here every generation
request records per-stage latency and yield counters, exposed as
``generator.last_metrics`` and aggregated by the serving layer.
"""

from __future__ import annotations

import time
from typing import Dict


class StageTimer:
    """Context-manager stage clock: ``with timer.stage("edm"): ...``."""

    def __init__(self):
        self.stages: Dict[str, float] = {}
        self.counters: Dict[str, float] = {}
        self._t0 = time.perf_counter()

    def stage(self, name: str):
        timer = self

        class _Stage:
            def __enter__(self):
                self._start = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timer.stages[name] = (timer.stages.get(name, 0.0)
                                      + time.perf_counter() - self._start)
                return False

        return _Stage()

    def count(self, name: str, value: float) -> None:
        self.counters[name] = value

    def summary(self) -> Dict[str, float]:
        out = {f"{k}_s": round(v, 4) for k, v in self.stages.items()}
        out.update(self.counters)
        out["total_s"] = round(time.perf_counter() - self._t0, 4)
        return out
