"""Per-stage profiling: running-average wall-clock counters + JAX profiler.

Rebuild of the reference's ad-hoc std::chrono stopwatches with running
averages per stage (laserPretreatmentNode.cpp:226-234,
laserProcessingNode.cpp:121-126, odomEstimationNode.cpp:231-238,
semanticFusionNode.cpp:164-169, subMapOptmizationNode.cpp:730-736) as one
structured tracer, plus a context manager around jax.profiler for device
traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    @property
    def mean_ms(self) -> float:
        return 1e3 * self.total_s / max(self.count, 1)


class StageTimer:
    """Accumulates wall-clock per named stage; prints running averages like
    the reference's "Average ... time %f ms" logs."""

    def __init__(self, log_every: int = 0, log_fn=print):
        self.stats: dict[str, StageStats] = defaultdict(StageStats)
        self.log_every = log_every
        self.log_fn = log_fn

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stats[name]
            s.count += 1
            s.total_s += dt
            s.max_s = max(s.max_s, dt)
            if self.log_every and s.count % self.log_every == 0:
                self.log_fn(
                    f"Average {name} time {s.mean_ms:.2f} ms "
                    f"(n={s.count}, max={s.max_s * 1e3:.2f} ms)"
                )

    def report(self) -> dict:
        return {
            k: {"mean_ms": v.mean_ms, "count": v.count,
                "max_ms": v.max_s * 1e3}
            for k, v in sorted(self.stats.items())
        }

    def summary(self) -> str:
        lines = [
            f"{k:30s} mean {v['mean_ms']:8.2f} ms  n={v['count']:5d}  "
            f"max {v['max_ms']:8.2f} ms"
            for k, v in self.report().items()
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a block (for xprof/tensorboard analysis)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
