"""TPU measurement: mixed-precision (inexact-ADMM) schedule vs all-bf16x3.

Uses iteration-scaling timing (t(m_big) - t(m_small)) / (m_big - m_small) so
the ~0.6 s host-fetch/tunnel overhead cancels (CLAUDE.md: block_until_ready
returns early on this platform; never trust whole-solve wall times).

Run on the real TPU (JAX_PLATFORMS=axon) in background with a log.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from torch_admm_deconv_tpu.kernels.vmem_solver import (
    admm_tv_adaptive_vmem,
    admm_tv_vmem,
)
from torch_admm_deconv_tpu.utils.profiling import iter_scaling_throughput, timed_fetch


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    rng = np.random.default_rng(0)
    b, c, h, w = 8, 3, 512, 512
    x = jnp.asarray(rng.random((b, c, h, w), dtype=np.float32) * 0.8 + 0.1)
    lmbd, rho = 0.05, 0.8

    # ---- fixed-iteration throughput, overhead-free ----
    rates = {}
    for prec in ("high", "mixed"):
        per_iter = iter_scaling_throughput(
            lambda m: lambda v: admm_tv_vmem(
                v, lmbd, rho, None, iso=False, maxit=m, precision=prec
            ),
            x,
            m_small=200,
            m_big=1000,
        )
        rates[prec] = 1.0 / per_iter
        log(f"fixed[{prec}]: {per_iter * 1e6:.1f} us/iter = {rates[prec]:.0f} it/s/chip")
    log(f"fixed mixed/high speedup: {rates['mixed'] / rates['high']:.2f}x")

    out_hi = np.asarray(admm_tv_vmem(x, lmbd, rho, None, iso=False, maxit=200))
    out_mx = np.asarray(
        admm_tv_vmem(x, lmbd, rho, None, iso=False, maxit=200, precision="mixed")
    )
    log(f"fixed mixed-vs-high max|diff| at 200 iters = {np.abs(out_mx - out_hi).max():.2e}")

    # ---- fast_frac sweep: deviation + throughput vs the exact tail length --
    # (justifies the bench's _FAST_FRAC choice; the tail must contract the
    # bf16 fast-phase roundoff — Eckstein & Bertsekas summable-error)
    for frac in (0.75, 0.875, 0.9375):
        out_f = np.asarray(
            admm_tv_vmem(x, lmbd, rho, None, iso=False, maxit=200,
                         precision="mixed", fast_frac=frac)
        )
        per_iter = iter_scaling_throughput(
            lambda m: lambda v: admm_tv_vmem(
                v, lmbd, rho, None, iso=False, maxit=m,
                precision="mixed", fast_frac=frac,
            ).sum(),
            x,
            m_small=200,
            m_big=1000,
        )
        log(
            f"fast_frac={frac}: max|diff| vs high = "
            f"{np.abs(out_f - out_hi).max():.2e}, "
            f"{per_iter * 1e6:.2f} us/iter = {1/per_iter:.0f} it/s"
        )

    # ---- adaptive time-to-tol: difference two tolerances so fetch cancels ----
    for prec in ("high", "mixed"):
        ts = {}
        its = {}
        for tol in (1e-3, 1e-5):
            fn = lambda v: admm_tv_adaptive_vmem(  # noqa: E731
                v, lmbd, rho, None, iso=False, maxit=2000, tol=tol, precision=prec
            ).x
            res = admm_tv_adaptive_vmem(
                x, lmbd, rho, None, iso=False, maxit=2000, tol=tol, precision=prec
            )
            np.asarray(res.x)
            its[tol] = int(np.asarray(res.iters).max())
            ts[tol] = timed_fetch(fn, x, reps=3)
        extra_it = its[1e-5] - its[1e-3]
        per_iter = (ts[1e-5] - ts[1e-3]) / max(extra_it, 1)
        log(
            f"adaptive[{prec}]: iters(1e-3)={its[1e-3]} iters(1e-5)={its[1e-5]}, "
            f"marginal {per_iter * 1e6:.1f} us/iter; "
            f"est solve-only t(1e-5) ~ {its[1e-5] * per_iter * 1e3:.1f} ms"
        )


if __name__ == "__main__":
    main()
