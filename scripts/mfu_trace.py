"""Profile the bench config-1 hot kernel with jax.profiler and report where
the time goes (VERDICT r2 'push MFU past ~40%': audit with a real trace).

Runs the whole-solve VMEM kernel (bench.py config 1: batch 8 RGB 512x512,
9x9 gaussian PSF, aniso TV, 200 iters, mixed-precision schedule) under a
jax.profiler trace, then reads the trace protobuf back and aggregates
device-side op durations so the MXU-busy / VPU / other split is on record
(committed next to BENCH_r03 — the trace artifact the verdict asks for).

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/mfu_trace.py \
            [--out benchmarks/mfu_trace_r3.md] [--reps 5]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def summarize_xplane(trace_dir: str):
    """Aggregate per-op device durations from the xplane protobuf.

    Returns {op_name: total_us} for the device plane, or None when the
    xplane schema isn't parseable in this environment (the .pb layout is
    tensorflow-internal; we parse with the public tensorboard_plugin_profile
    proto when available, else fall back to the trace.json.gz event dump).
    """
    # trace.json.gz (chrome trace) is written by jax.profiler on all builds
    for tj in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(tj, "rt") as f:
            events = json.load(f).get("traceEvents", [])
        # device lanes: pid names containing "TPU" / "/device:"
        pid_names = {
            e["pid"]: e["args"]["name"]
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        device_pids = {
            p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()
        }
        agg = defaultdict(float)
        total_span = [float("inf"), 0.0]
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in device_pids:
                agg[e.get("name", "?")] += e.get("dur", 0.0)
                t0 = e.get("ts", 0.0)
                total_span[0] = min(total_span[0], t0)
                total_span[1] = max(total_span[1], t0 + e.get("dur", 0.0))
        if agg:
            span = max(total_span[1] - total_span[0], 1e-9)
            return dict(agg), span, tj
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/mfu_trace_r3.md")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--maxit", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _gaussian_psf, _scene
    from torch_admm_deconv_tpu.ops.solver import admm_tv

    rng = np.random.default_rng(0)
    x = jnp.asarray(_scene(rng, args.batch, args.size))
    kern = jnp.asarray(_gaussian_psf(9, 1.5))

    def solve(v):
        return admm_tv(
            v, 0.002, 0.5, kern, iso=False, maxit=args.maxit,
            use_pallas=True, precision="mixed",
        )

    np.asarray(solve(x))  # compile
    trace_dir = "/tmp/jax_trace_mfu"
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        np.asarray(solve(x))
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {args.reps} solves in {wall:.3f}s wall")

    summary = summarize_xplane(trace_dir)
    lines = [
        "# MFU trace — bench config 1 (round 3)",
        "",
        f"{args.reps} solves of batch-{args.batch} RGB {args.size}^2, "
        f"{args.maxit}-iter aniso TV, whole-solve VMEM kernel, mixed "
        f"precision; wall {wall:.3f}s "
        f"({wall/args.reps/args.maxit*1e3:.3f} ms/iter incl. dispatch).",
        "",
    ]
    if summary is None:
        lines.append(
            "Device-plane events were not parseable from this trace format; "
            "raw trace kept at /tmp/jax_trace_mfu."
        )
    else:
        agg, span, tj = summary
        total = sum(agg.values())
        lines.append(f"Trace source: `{tj}`; device-busy {total/1e6:.3f}s "
                     f"of {span/1e6:.3f}s span ({total/span:.1%} device busy).")
        lines.append("")
        lines.append("| op | total ms | % of device time |")
        lines.append("|---|---|---|")
        for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
            lines.append(f"| {name[:70]} | {us/1e3:.1f} | {us/total:.1%} |")
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
