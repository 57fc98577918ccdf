"""Profiling + observability helpers.

The reference only has wall-clock `eps time` logging (`run.py:305-327`) and a
prepare/process Timer (`source/utils/timer.py`). Here:

* `trace(logdir)` — context manager around `jax.profiler` emitting a
  TensorBoard-viewable trace of the jitted steps (the XLA-native replacement
  for torch.profiler/NVTX which the reference lacks).
* `RaysPerSecond` — the north-star throughput meter.
* `checkify_nan_debug` — opt-in NaN localisation for a jitted function, the
  jit-pure replacement for CUDA_LAUNCH_BLOCKING-style debugging
  (`run.py:7`, `recon_scene.py:11`).
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RaysPerSecond:
    """Sliding-window rays/sec counter."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events: list[tuple[float, int]] = []

    def update(self, n_rays: int) -> float:
        now = time.perf_counter()
        self._events.append((now, n_rays))
        if len(self._events) > self.window:
            self._events.pop(0)
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        total = sum(n for _, n in self._events[1:])
        return total / max(dt, 1e-9)


def checkify_nan_debug(fn):
    """Wrap a jittable fn so NaN/Inf production raises with a location.

    Usage: err, out = checkify_nan_debug(train_step)(args...); err.throw().
    """
    import jax
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)
