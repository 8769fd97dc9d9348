"""Profiling: jax.profiler traces + the reference's wall-clock split.

The reference logs pth_time (device compute) vs env_time (sim stepping)
per rollout (reference ddppo_waypoint_trainer.py:154-157,187-188,222-225);
trainers here keep that split and can additionally capture a device trace
into TPU.PROFILE_DIR for tensorboard's profile plugin / xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class SectionTimers:
    """Named wall-clock accumulators (pth_time / env_time / update_time)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        return " ".join(f"{k}={v:.1f}s" for k, v in sorted(self.totals.items()))

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace when profile_dir is set."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in device traces (shows up in xprof timelines)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
