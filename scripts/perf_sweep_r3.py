"""Round-3 chip-window perf sweep: mixed-precision split (fast_frac) A/B on
the config-1 kernel, plus the general-PSF (motion) VMEM kernel rate.

Everything uses the A/B-interleaved robust timing harness
(utils/profiling.robust_iter_timing) and reports dispersion bands; the
deviation-vs-bf16x3 check guards each fast_frac candidate so speed never
silently buys accuracy (VERDICT r2 'make the bench unimpeachable' applied
to tuning runs too).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/perf_sweep_r3.py \
           [--out benchmarks/perf_sweep_r3.md]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/perf_sweep_r3.md")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--maxit", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _gaussian_psf, _motion_psf, _scene
    from torch_admm_deconv_tpu.kernels.vmem_solver import admm_tv_vmem
    from torch_admm_deconv_tpu.utils.profiling import robust_iter_timing

    rng = np.random.default_rng(0)
    x = jnp.asarray(_scene(rng, args.batch, args.size))
    kg = jnp.asarray(_gaussian_psf(9, 1.5))
    km = jnp.asarray(_motion_psf(9))
    lines = [
        "# Round-3 perf sweep (fast_frac + general-PSF VMEM)",
        "",
        f"batch {args.batch} RGB {args.size}^2, {args.maxit}-iter aniso TV, "
        "whole-solve VMEM kernel, robust interleaved timing.",
        "",
        "| config | us/iter | it/s | +/- | max dev vs bf16x3 |",
        "|---|---|---|---|---|",
    ]

    ref_out = np.asarray(
        admm_tv_vmem(x, 0.002, 0.5, kg, iso=False, maxit=args.maxit)
    )

    def time_cfg(label, kern, ref, **kw):
        def of_maxit(m):
            return lambda v: admm_tv_vmem(v, 0.002, 0.5, kern, iso=False, maxit=m, **kw)

        res = robust_iter_timing(
            of_maxit, x, m_small=args.maxit, m_big=3 * args.maxit,
            reps=7, on_unreliable="flag",
        )
        dev = float("nan")
        if ref is not None:
            out = np.asarray(
                admm_tv_vmem(x, 0.002, 0.5, kern, iso=False, maxit=args.maxit, **kw)
            )
            dev = float(np.abs(out - ref).max())
        flag = " (UNRELIABLE)" if res.unreliable else ""
        lines.append(
            f"| {label}{flag} | {res.per_iter*1e6:.1f} | {1/res.per_iter:.1f} "
            f"| {res.rel_spread:.1%} | {dev:.2e} |"
        )
        print(lines[-1], flush=True)
        return res

    time_cfg("gaussian high (bf16x3)", kg, None, precision="high")
    for frac in (0.75, 0.875, 0.9375):
        time_cfg(f"gaussian mixed f={frac}", kg, ref_out,
                 precision="mixed", fast_frac=frac)
    time_cfg("gaussian high interleaved", kg, ref_out,
             precision="high", schedule="interleaved")
    time_cfg("gaussian mixed f=0.75 interleaved", kg, ref_out,
             precision="mixed", fast_frac=0.75, schedule="interleaved")

    ref_m = np.asarray(admm_tv_vmem(x, 0.002, 0.5, km, iso=False, maxit=args.maxit))
    time_cfg("motion high (bf16x3, Hartley-pair)", km, None, precision="high")
    time_cfg("motion mixed f=0.75", km, ref_m, precision="mixed", fast_frac=0.75)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
