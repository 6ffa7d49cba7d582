"""Tracing, profiling, and numerical-sanitizer utilities.

SURVEY.md §5: the reference's observability is wall-clock prints
(train_mimic.py:204,271) and scattered NaN asserts acting as a numerical
sanitizer (fc.py:42-48, graph_att_layer.py, language_model.py). The
TPU-native equivalents:

  * `step_timer` — per-step wall-clock + EMA throughput, the
    "iter_end_time" replacement.
  * `profile` — context manager around jax.profiler traces (view in
    TensorBoard / xprof), green-field per SURVEY §5.
  * `enable_nan_debugging` — jax_debug_nans: every scattered reference
    assert becomes one flag that localizes the first NaN-producing op.
  * `log_compile_time` — wraps a jitted fn to report compile vs run
    time, surfacing recompilation bugs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional


class StepTimer:
    """EMA step timing + items/sec (train_mimic.py:204,271 analog)."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema)
        self.last = dt
        return False

    def throughput(self, items: int) -> float:
        return items / self.ema if self.ema else float("nan")


@contextlib.contextmanager
def profile(logdir: str = "/tmp/ekaid_profile",
            host_tracer_level: int = 2):
    """jax.profiler trace context; inspect with xprof/TensorBoard."""
    import jax
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True):
    """Global NaN sanitizer (replaces the reference's per-layer asserts,
    SURVEY.md §4/§5): under jit, the first NaN raises with the
    originating op's location."""
    import jax
    jax.config.update("jax_debug_nans", enable)


def log_compile_time(fn: Callable, name: str = "fn") -> Callable:
    """Wrap a jitted fn: print compile (first-call) vs steady-state time."""
    state = {"calls": 0}

    def wrapper(*args, **kwargs):
        import jax
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        state["calls"] += 1
        tag = "compile+run" if state["calls"] == 1 else "run"
        print(f"[{name}] {tag}: {dt * 1e3:.2f} ms")
        return out

    return wrapper
