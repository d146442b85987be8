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
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

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


@dataclass
class TimingResult:
    """Robust per-iteration timing with an honest error band.

    ``per_iter`` is the median of interleaved (t_big - t_small) pairs;
    ``rel_spread`` is the half-IQR of those samples relative to the median
    (report as a +/- band); ``overhead`` estimates the fixed dispatch+fetch
    cost per call; ``contended`` flags calibration-kernel drift during the
    measurement; ``fallback`` is True only when the subtraction was
    non-positive and the conservative whole-solve rate was used instead
    (callers must surface this — round-2's silent fallback made the
    published JSON mix two methodologies, ADVICE r2 finding 3)."""

    per_iter: float
    rel_spread: float
    overhead: float
    contended: bool = False
    fallback: bool = False
    unreliable: bool = False
    samples: List[float] = field(default_factory=list)
    calibration_ms: List[float] = field(default_factory=list)


def robust_iter_timing(
    solver_of_maxit: Callable[[int], Callable],
    x,
    m_small: int,
    m_big: int,
    reps: int = 9,
    max_rel_spread: float = 0.25,
    calibrate: Optional[Callable] = None,
    on_unreliable: str = "raise",
) -> TimingResult:
    """Per-iteration time of a solver loop body, robust to tunnel noise.

    Methodology (round-3 hardening of ``iter_scaling_throughput`` after the
    round-2 driver/builder numbers disagreed by 1.3-2.6x under device
    contention — VERDICT r2 'make the bench unimpeachable'):

    * A/B interleaving: each rep times t_small then t_big back-to-back, so
      slow drift (tunnel load, compile-service traffic) hits both sides of
      the subtraction equally instead of biasing one.
    * median-of-``reps`` pairwise differences with the half-IQR as the
      dispersion estimate; a spread above ``max_rel_spread`` raises
      RuntimeError (fail loudly) rather than publishing a mushy number.
    * contention canary: ``calibrate`` (default: the m_small solve itself)
      is re-measured first/mid/last; >50% drift flags ``contended`` and the
      rep set is widened once before giving up.
    * the non-positive-subtraction fallback is never silent: the result
      carries ``fallback=True`` and the spread check still applies to the
      whole-solve times.
    """
    f_small = solver_of_maxit(m_small)
    f_big = solver_of_maxit(m_big)
    np.asarray(f_small(x))
    np.asarray(f_big(x))  # compile both before any timing

    cal_fn = calibrate or (lambda: np.asarray(f_small(x)))

    def run_pairs(n):
        cal = []
        pairs = []
        for i in range(n):
            if i in (0, n // 2, n - 1):
                t0 = time.perf_counter()
                cal_fn()
                cal.append((time.perf_counter() - t0) * 1e3)
            t0 = time.perf_counter()
            np.asarray(f_small(x))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f_big(x))
            tb = time.perf_counter() - t0
            pairs.append((ts, tb))
        return pairs, cal

    pairs, cal = run_pairs(reps)
    contended = (max(cal) / max(min(cal), 1e-9)) > 1.5

    def analyze(pairs):
        diffs = [(tb - ts) / (m_big - m_small) for ts, tb in pairs]
        med = float(np.median(diffs))
        q75, q25 = np.percentile(diffs, [75, 25])
        half_iqr = float(q75 - q25) / 2.0
        return diffs, med, half_iqr

    diffs, med, half_iqr = analyze(pairs)
    if contended or med <= 0 or (med > 0 and half_iqr / med > max_rel_spread):
        # one retry with a wider rep set before failing/falling back
        pairs2, cal2 = run_pairs(2 * reps)
        pairs = pairs + pairs2
        cal = cal + cal2
        contended = (max(cal) / max(min(cal), 1e-9)) > 1.5
        diffs, med, half_iqr = analyze(pairs)

    fallback = False
    if med <= 0:
        # conservative whole-solve rate: includes dispatch overhead
        t_bigs = [tb for _, tb in pairs]
        med = float(np.median(t_bigs)) / m_big
        q75, q25 = np.percentile(t_bigs, [75, 25])
        half_iqr = float(q75 - q25) / 2.0 / m_big
        fallback = True

    rel_spread = half_iqr / med if med > 0 else float("inf")
    unreliable = rel_spread > max_rel_spread
    if unreliable:
        msg = (
            f"timing spread {rel_spread:.1%} exceeds {max_rel_spread:.0%} "
            f"(median {med*1e3:.3f} ms/iter, {len(pairs)} interleaved pairs, "
            f"calibration {['%.1f' % c for c in cal]} ms) — measurement "
            "unreliable; rerun when the device is quiet"
        )
        if on_unreliable == "raise":
            raise RuntimeError(msg)
        # 'flag' mode: callers that must always produce a result (the
        # driver-run bench) get the number with unreliable=True and the
        # warning on stderr — loud, but never silent and never fatal
        import sys as _sys

        print(f"WARNING: {msg}", file=_sys.stderr, flush=True)
    t_smalls = [ts for ts, _ in pairs]
    overhead = max(float(np.median(t_smalls)) - m_small * med, 0.0)
    return TimingResult(
        per_iter=med,
        rel_spread=rel_spread,
        overhead=overhead,
        contended=contended,
        fallback=fallback,
        unreliable=unreliable,
        samples=diffs,
        calibration_ms=cal,
    )


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
