"""Stage-level timing + JSON curve logs.

Reproduces the reference's observability contract: per-stage elapsed-time dicts
in the live path (/root/reference/pipeline/utils.py:413,515,605,637) and the
per-epoch JSON log files that the live matplotlib dashboards poll
(/root/reference/segmentation/__init__.py:236-244). Adds optional jax.profiler
trace capture, which the reference lacks.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class StageTimer:
    """Collects named stage durations; `.elapsed` matches the reference's
    elapsed_times dict keys ({'segmentation', 'pose_estimation', 'total'})."""

    def __init__(self) -> None:
        self._start = time.perf_counter()
        self.elapsed: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.elapsed[name] = time.perf_counter() - t0

    def total(self, name: str = "total") -> Dict[str, float]:
        self.elapsed[name] = time.perf_counter() - self._start
        return self.elapsed


class JsonCurveLog:
    """Epoch-curve log rewritten wholesale each update (reference behavior:
    the stream_logs.py dashboards re-read the whole file each frame)."""

    def __init__(self, path: str, config: Optional[Dict] = None) -> None:
        self.path = path
        self.data: Dict = dict(config or {})
        self.data.setdefault("curves", {})

    def append(self, **values) -> None:
        for key, val in values.items():
            self.data["curves"].setdefault(key, []).append(
                float(val) if hasattr(val, "__float__") else val
            )
        self.flush()

    def set(self, **values) -> None:
        self.data.update(values)
        self.flush()

    def flush(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self.data, f)


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace context if trace_dir given, else no-op."""
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
