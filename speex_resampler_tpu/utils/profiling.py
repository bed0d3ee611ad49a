"""Lightweight throughput/latency instrumentation.

The reference's only tracing is performance.now() bracketing in its test
harness (src/test.ts:31-34).  Here: a counters object engines update per
launch, and an optional jax.profiler trace context for deep dives.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

__all__ = ["LaunchStats", "trace"]


@dataclasses.dataclass
class LaunchStats:
    """Rolling serving metrics; cheap enough to keep always-on."""
    launches: int = 0
    in_samples: int = 0
    out_samples: int = 0
    device_seconds: float = 0.0

    def record(self, n_in: int, n_out: int, seconds: float):
        self.launches += 1
        self.in_samples += n_in
        self.out_samples += n_out
        self.device_seconds += seconds

    @contextlib.contextmanager
    def launch(self, n_in: int, n_out: int):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(n_in, n_out, time.perf_counter() - t0)

    @property
    def out_samples_per_sec(self) -> float:
        return self.out_samples / self.device_seconds \
            if self.device_seconds else 0.0

    def as_dict(self) -> dict:
        return {
            "launches": self.launches,
            "in_samples": self.in_samples,
            "out_samples": self.out_samples,
            "device_seconds": round(self.device_seconds, 6),
            "out_samples_per_sec": round(self.out_samples_per_sec),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
