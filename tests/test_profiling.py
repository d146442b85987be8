"""Unit tests for the round-3 robust timing harness (utils/profiling.py).

The harness exists because the round-2 driver/builder bench numbers
disagreed by 1.3-2.6x under device contention (VERDICT r2 "make the bench
unimpeachable"). These tests drive it with synthetic sleep-based "solvers"
so the statistical machinery (A/B-interleaved median, dispersion band,
non-positive-subtraction fallback, loud unreliable flag) is exercised
without a TPU.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from torch_admm_deconv_tpu.utils.profiling import (
    StepTimer,
    TimingResult,
    robust_iter_timing,
)

_OUT = np.zeros(1, np.float32)


def _sleeping_solver(per_iter_s: float, overhead_s: float = 0.0):
    """solver_of_maxit whose call time is overhead + maxit*per_iter."""

    def of_maxit(m):
        def fn(x):
            time.sleep(overhead_s + m * per_iter_s)
            return _OUT

        return fn

    return of_maxit


def test_clean_measurement_recovers_per_iter_and_overhead():
    res = robust_iter_timing(
        _sleeping_solver(2e-4, overhead_s=5e-3), None, m_small=10, m_big=60, reps=5
    )
    assert isinstance(res, TimingResult)
    assert not res.fallback and not res.unreliable
    assert res.per_iter == pytest.approx(2e-4, rel=0.35)
    # overhead estimate: t_small - m_small*per_iter ~ 5 ms
    assert res.overhead == pytest.approx(5e-3, rel=0.5)
    assert len(res.samples) >= 5
    assert len(res.calibration_ms) >= 3


def test_nonpositive_subtraction_falls_back_loudly():
    # t_big < t_small => negative subtraction => conservative whole-solve
    # rate with fallback=True (never silent — ADVICE r2 finding 3)
    def of_maxit(m):
        def fn(x):
            time.sleep(4e-3 if m == 10 else 2e-3)
            return _OUT

        return fn

    res = robust_iter_timing(of_maxit, None, m_small=10, m_big=60, reps=3)
    assert res.fallback
    assert res.per_iter == pytest.approx(2e-3 / 60, rel=0.5)


def test_unreliable_raises_by_default_and_flags_on_request():
    # alternating fast/slow big-solve => huge half-IQR => unreliable
    state = {"i": 0}

    def of_maxit(m):
        def fn(x):
            if m == 60:
                state["i"] += 1
                time.sleep(1e-3 if state["i"] % 2 else 3e-2)
            else:
                time.sleep(1e-3)
            return _OUT

        return fn

    with pytest.raises(RuntimeError, match="unreliable"):
        robust_iter_timing(of_maxit, None, m_small=10, m_big=60, reps=4)

    state["i"] = 0
    res = robust_iter_timing(
        of_maxit, None, m_small=10, m_big=60, reps=4, on_unreliable="flag"
    )
    assert res.unreliable
    assert res.rel_spread > 0.25


def test_step_timer_windowed_rate():
    st = StepTimer(window=4)
    assert st.tick() is None
    for _ in range(6):
        time.sleep(1e-3)
        rate = st.tick()
    assert st.total_steps == 7
    assert rate is not None and rate > 0
