"""Weak-scaling harness for the spatially-tiled solver (BASELINE.json:
>=85% weak-scaling efficiency target).

Weak scaling: image rows grow with the shard count (fixed work per shard),
so perfect scaling keeps time/iteration constant. On this machine only one
real chip exists, so `--platform cpu` runs the harness on the virtual
8-device host mesh (validates the harness + collective path; CPU numbers
are not a TPU efficiency claim). On a real multi-chip slice, run as-is.

Prints one JSON line per shard count plus a summary efficiency line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None)
    parser.add_argument("--rows_per_shard", type=int, default=256)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--maxit", type=int, default=50)
    parser.add_argument("--chain", type=int, default=4)
    parser.add_argument("--x_update_mode", choices=["pencil", "halo"], default="pencil")
    parser.add_argument("--halo", type=int, default=32)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.parallel import make_mesh, spatial_admm_tv
    from torch_admm_deconv_tpu.utils.profiling import timed_fetch

    n_dev = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    rng = np.random.default_rng(0)
    times = {}
    for n in counts:
        mesh = make_mesh((n,), ("space",), jax.devices()[:n])
        h = args.rows_per_shard * n
        x = jnp.asarray(rng.random((1, 3, h, args.width), dtype=np.float32))

        def solve(v, mesh=mesh):
            return spatial_admm_tv(v, 0.05, 1.0, None, maxit=args.maxit, mesh=mesh,
                                   x_update_mode=args.x_update_mode, halo=args.halo)

        np.asarray(solve(x))  # compile
        t = timed_fetch(solve, x)
        times[n] = t
        print(
            json.dumps(
                {
                    "metric": f"spatial_weak_scaling_{n}shards",
                    "value": round(args.maxit / t, 2),
                    "unit": "iterations/s",
                    "rows": h,
                }
            ),
            file=sys.stderr,
        )
    if len(counts) > 1:
        eff = times[counts[0]] / times[counts[-1]]
        print(
            json.dumps(
                {
                    "metric": "spatial_weak_scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": f"t({counts[0]})/t({counts[-1]}) at fixed work/shard",
                    "vs_baseline": None,
                }
            )
        )


if __name__ == "__main__":
    main()
