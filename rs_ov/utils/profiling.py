"""Tracing / profiling utilities (the aux subsystem the reference lacks —
SURVEY.md §5: only mmengine IterTimerHook existed).

  * ``trace(logdir)``: context manager around jax.profiler for TensorBoard
    traces of the fused segmentation program.
  * ``Throughput``: a tiles/sec/chip counter — the north-star metric.
  * ``annotate``: named_scope wrapper so pipeline stages show up in traces.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "Throughput"]


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap a function in a profiler named scope."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco


class Throughput:
    """Accumulates pixels processed and reports 512^2-tile units per second."""

    def __init__(self):
        self.pixels = 0
        self._t0 = time.perf_counter()

    def add_image(self, h: int, w: int) -> None:
        self.pixels += h * w

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def tiles512_per_sec(self) -> float:
        e = self.elapsed
        return (self.pixels / (512.0 * 512.0)) / e if e > 0 else 0.0

    def report(self, n_chips: int = 1) -> dict:
        return {
            "tiles512_per_sec": self.tiles512_per_sec,
            "tiles512_per_sec_per_chip": self.tiles512_per_sec / max(n_chips, 1),
            "elapsed_sec": self.elapsed,
        }
