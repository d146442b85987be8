"""Profiling / tracing utilities (SURVEY.md §5: the reference has tqdm bars
and a parameter table only; iterations/s is a first-class metric here).

``chained_throughput`` is the canonical timing method on this platform: the
device tunnel's ``block_until_ready`` returns before execution completes, so
wall-clock must be taken around a host fetch, and per-step time comes from
the difference between a chain-of-N and a chain-of-1 (transfer/dispatch
overhead cancels).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace scope; view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_fetch(fn: Callable, *args, reps: int = 3) -> float:
    """Best-of-N wall time of fn(*args) INCLUDING a host fetch."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def chained_throughput(step_fn: Callable, x, chain: int = 6, reps: int = 3) -> float:
    """Seconds per step of ``step_fn`` (x -> same-shaped x), overhead-free."""

    def make(n):
        @jax.jit
        def chained(v):
            def body(c, _):
                return step_fn(c), None

            out, _ = jax.lax.scan(body, v, None, length=n)
            return out

        return chained

    c1, cn = make(1), make(chain)
    np.asarray(c1(x))
    np.asarray(cn(x))  # compile
    t1 = timed_fetch(c1, x, reps=reps)
    tn = timed_fetch(cn, x, reps=reps)
    return (tn - t1) / (chain - 1)


def iter_scaling_throughput(
    solver_of_maxit: Callable[[int], Callable], x, m_small: int = 200, m_big: int = 1000, reps: int = 5
) -> float:
    """Seconds per solver iteration from two iteration counts of the SAME
    loop body: per-iter = (t(m_big) - t(m_small)) / (m_big - m_small).
    Fetch/dispatch overhead cancels and — unlike chaining solves — the
    compiled graph stays small (chain compiles can stall the remote compile
    helper for many minutes on this platform).

    Tunnel fetch latency is noisy enough that the subtraction can come out
    non-positive when the device is contended; in that case fall back to
    the conservative whole-solve rate t(m_big)/m_big (includes dispatch
    overhead — an underestimate of true throughput, never a negative)."""
    f_small = solver_of_maxit(m_small)
    f_big = solver_of_maxit(m_big)
    np.asarray(f_small(x))
    np.asarray(f_big(x))  # compile
    t_small = timed_fetch(f_small, x, reps=reps)
    t_big = timed_fetch(f_big, x, reps=reps)
    per_iter = (t_big - t_small) / (m_big - m_small)
    if per_iter <= 0:
        per_iter = t_big / m_big
    return per_iter


class StepTimer:
    """Windowed steps/s counter for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._count = 0

    def tick(self) -> Optional[float]:
        """Call once per step; returns current steps/s (or None early)."""
        self._times.append(time.perf_counter())
        self._count += 1
        if len(self._times) > self.window:
            self._times.pop(0)
        if len(self._times) < 2:
            return None
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else None

    @property
    def total_steps(self) -> int:
        return self._count


def solver_stats(result) -> Dict[str, float]:
    """Summary dict from an AdaptiveResult (iters, residuals, rho)."""
    return {
        "iters": int(result.iters),
        "r_norm": float(result.r_norm),
        "s_norm": float(result.s_norm),
        "rho": float(result.rho),
    }
