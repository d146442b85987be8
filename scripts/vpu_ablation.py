"""Decompose the VMEM kernel's per-iteration time without a device profiler.

The round-4 MFU audit (benchmarks/mfu_trace_r4.md) bounded the kernel at
its VPU elementwise chain: 8.69 us/plane-iter total, of which 4.09 us is
executed-pass MXU time at peak and ~4.6 us is "shrinkage + dual + RHS +
rolls". Round 5 then removed ~20% of that chain's ALU ops (fold 1/(H*W)
into the spectrum; clip-form shrinkage regroup, commit 72c956b) and the
measured config1 solve moved 41.7 -> 41.3 ms (-1%, inside the +/-0.6%
band): the chain is NOT ALU-op-count bound. This script measures WHAT it
is bound by, by timing numerically-wrong ablated kernels that each drop
one class of work (kernels/vmem_solver._make_kernel ``ablate``; the
jax.profiler trace wedges on the stdio tunnel, so ablation is the only
measurement available):

* ''          — the real kernel (reference point, = bench config1)
* 'no_roll'   — all 4 pltpu.roll lane/sublane rotations replaced by
                identity; every ALU op and store kept
* 'no_shrink' — rolls and stores kept; the shrinkage/dual ALU dropped
* 'mxu_only'  — the elementwise chain skipped entirely (matmuls + loop)

Same shapes/methodology as bench config1 (512^2, batch 8, 9x9 Gaussian
PSF, aniso, mixed fast_frac=0.75; robust_iter_timing chained scaling with
scalar-checksum fetches).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/vpu_ablation.py \
           [--out benchmarks/vpu_ablation_r5.md]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--maxit", type=int, default=200)
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--out", default="benchmarks/vpu_ablation_r5.md")
    ap.add_argument("--variants", default=",no_roll,no_shrink,mxu_only",
                    help="comma-separated ablate values ('' = full kernel); "
                         "also: double_convert (prices the f32->bf16 operand "
                         "conversions on the fast-phase matmul path), "
                         "no_hside / no_wside (drop one transform stage — "
                         "run these with --fast_frac 1.0 so the exact tail "
                         "does not dilute the ablation)")
    ap.add_argument("--fast_frac", type=float, default=None,
                    help="override the bench _FAST_FRAC for all variants")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from bench import _FAST_FRAC, _gaussian_psf, _scene
    from torch_admm_deconv_tpu.kernels.vmem_solver import admm_tv_vmem
    from torch_admm_deconv_tpu.utils.profiling import robust_iter_timing

    rng = np.random.default_rng(0)
    x = jnp.asarray(_scene(rng, args.batch, args.size))
    kern = jnp.asarray(_gaussian_psf(9, 1.5))
    planes = args.batch * 3
    fast_frac = _FAST_FRAC if args.fast_frac is None else args.fast_frac

    rows = []
    for ablate in args.variants.split(","):
        def solver_of_maxit(m, ablate=ablate):
            return lambda v: admm_tv_vmem(
                v, 0.002, 0.5, kern, iso=False, maxit=m,
                precision="mixed", fast_frac=fast_frac, _ablate=ablate,
            ).sum()

        res = robust_iter_timing(
            solver_of_maxit, x, m_small=args.maxit, m_big=5 * args.maxit,
            reps=args.reps, on_unreliable="flag",
        )
        us_plane = res.per_iter / planes * 1e6
        rows.append((ablate or "full", us_plane, res.rel_spread,
                     bool(res.unreliable)))
        print(f"[ablation] {ablate or 'full':9s}: {us_plane:.2f} us/plane-iter "
              f"(+/- {res.rel_spread:.1%}{' UNRELIABLE' if res.unreliable else ''})",
              flush=True)

    full = rows[0][1]
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    lines = [
        "# VPU-chain ablation, round 5 (see module docstring for method)\n",
        f"Config1 shapes: {args.batch}x3x{args.size}x{args.size}, "
        f"{args.maxit}-iter scaling to {5*args.maxit}, mixed fast_frac "
        f"{fast_frac}. All numbers us/plane-iteration. Delta is vs the "
        "first row (negative = the variant did LESS work).\n",
        "| kernel variant | us/plane-iter | spread | delta vs first row |",
        "|---|---|---|---|",
    ]
    for name, us, spread, unrel in rows:
        d = us - full
        flag = " UNRELIABLE" if unrel else ""
        delta = "—" if name == rows[0][0] else f"{d:+.2f} us ({d / full:+.0%})"
        lines.append(f"| {name} | {us:.2f} | {spread:.1%}{flag} | {delta} |")
    lines.append("")
    out.write_text("\n".join(lines))
    print(json.dumps({r[0]: r[1] for r in rows}))


if __name__ == "__main__":
    main()
