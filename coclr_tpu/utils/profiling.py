"""Tracing / profiling subsystem.

The reference's only instrumentation is wall-clock meters
(main_nce.py:287-288,345-346; SURVEY.md §5.1). Here profiling is first-class:
XLA device traces via jax.profiler (viewable in TensorBoard / Perfetto),
per-step trace annotations, and a host-side StepTimer that reports data-wait
vs device-step time and clips/sec.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device trace for the enclosed steps."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str, step: int):
    """Annotate one train step in the device trace."""
    import jax

    return jax.profiler.StepTraceAnnotation(name, step_num=step)


class StepTimer:
    """Host-side step accounting: data-wait, step-dispatch, clips/sec.

    Usage:
        timer = StepTimer(clips_per_step=64)
        for batch in loader:
            timer.data_ready()
            ... dispatch step ...
            timer.step_done()
    """

    def __init__(self, clips_per_step: int = 0, window: int = 50):
        self.clips_per_step = clips_per_step
        self.window = window
        self.reset()

    def reset(self):
        self._last = time.perf_counter()
        self.data_times: List[float] = []
        self.step_times: List[float] = []

    def data_ready(self):
        now = time.perf_counter()
        self.data_times.append(now - self._last)
        self._last = now

    def step_done(self):
        now = time.perf_counter()
        self.step_times.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        import numpy as np

        d = np.asarray(self.data_times[-self.window:] or [0.0])
        s = np.asarray(self.step_times[-self.window:] or [0.0])
        total = d.mean() + s.mean()
        out = {
            "data_time_mean": float(d.mean()),
            "step_time_mean": float(s.mean()),
            "data_fraction": float(d.mean() / total) if total else 0.0,
        }
        if self.clips_per_step and total:
            out["clips_per_sec"] = self.clips_per_step / total
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump({"data_times": self.data_times,
                       "step_times": self.step_times,
                       "summary": self.summary()}, f)
