"""Tracing / profiling (SURVEY.md §5).

The reference's observability was GStreamer debug categories plus ad-hoc
gettimeofday deltas (mostly commented out; kmsfacedetect.cpp:866-895,
kmsnosedetect.cpp:929-955 writing /tmp/nose.log). This replaces that with:

  * `trace(name)` — wall-clock section timers with running stats
  * per-filter frame/detection counters
  * `device_profile(path)` — the JAX/XLA device profiler (TensorBoard trace)
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict


@dataclasses.dataclass
class SectionStats:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total_s / self.count if self.count else 0.0


class Tracer:
    def __init__(self):
        self.sections: dict[str, SectionStats] = defaultdict(SectionStats)
        self.counters: dict[str, int] = defaultdict(int)
        self.enabled = True

    @contextlib.contextmanager
    def trace(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.sections[name]
            s.count += 1
            s.total_s += dt
            s.max_s = max(s.max_s, dt)

    def count(self, name: str, n: int = 1):
        self.counters[name] += n

    def report(self) -> str:
        lines = ["=== vca trace ==="]
        for name, s in sorted(self.sections.items()):
            lines.append(f"{name:36s} n={s.count:6d} mean={s.mean_ms:8.2f}ms "
                         f"max={s.max_s * 1000:8.2f}ms")
        for name, v in sorted(self.counters.items()):
            lines.append(f"{name:36s} count={v}")
        return "\n".join(lines)


TRACER = Tracer()
trace = TRACER.trace
count = TRACER.count


@contextlib.contextmanager
def device_profile(logdir: str):
    """XLA device profiling around a region (view in TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
