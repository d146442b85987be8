"""Single-device spatial-solver overhead on the real TPU: pencil vs halo vs
unsharded (VERDICT r3 weak #5 — the pencil path measured 4.20x the
unsharded solver at 1 device in round 3; target <= 1.5x).

Times a 100-iteration iso TV denoise at 512^2 on a 1-device ``space`` mesh
for both x-update modes against the unsharded `admm_tv` XLA-scan path, with
the round-4 scalar-checksum fetch. Parity is asserted against the unsharded
result. Writes one JSON line per variant.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.ops.solver import admm_tv
    from torch_admm_deconv_tpu.parallel import make_mesh, spatial_admm_tv

    size, maxit, reps = 512, 100, 7
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.clip(rng.normal(size=(1, 3, size, size)) * 0.1 + 0.5, 0, 1).astype(np.float32)
    )
    mesh = make_mesh((1,), ("space",))

    variants = {
        "unsharded": lambda v: admm_tv(v, 0.05, 0.8, None, iso=True, maxit=maxit,
                                       iso_mode="joint").sum(),
        "spatial_pencil": lambda v: spatial_admm_tv(
            v, 0.05, 0.8, None, iso=True, maxit=maxit, mesh=mesh,
            iso_mode="joint", x_update_mode="pencil").sum(),
        "spatial_halo32": lambda v: spatial_admm_tv(
            v, 0.05, 0.8, None, iso=True, maxit=maxit, mesh=mesh,
            iso_mode="joint", x_update_mode="halo", halo=32).sum(),
    }

    times = {}
    for name, fn in variants.items():
        t0 = time.time()
        np.asarray(fn(x))  # compile
        print(f"[ab] {name} compiled/first-run in {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            ts.append(time.perf_counter() - t0)
        times[name] = float(np.median(ts))
        q75, q25 = np.percentile(ts, [75, 25])
        print(json.dumps({
            "metric": f"spatial_1dev_{name}_ms",
            "value": round(times[name] * 1e3, 1),
            "unit": "ms/solve (100 iters, incl dispatch)",
            "spread": round((q75 - q25) / 2 / times[name], 4),
        }), flush=True)

    base = times["unsharded"]
    for name in ("spatial_pencil", "spatial_halo32"):
        print(json.dumps({
            "metric": f"{name}_overhead_vs_unsharded",
            "value": round(times[name] / base, 3),
            "unit": "x (target <= 1.5)",
        }), flush=True)

    # parity of the halo result vs unsharded on the same input
    ref = np.asarray(admm_tv(x, 0.05, 0.8, None, iso=True, maxit=maxit, iso_mode="joint"))
    halo = np.asarray(spatial_admm_tv(x, 0.05, 0.8, None, iso=True, maxit=maxit,
                                      mesh=mesh, iso_mode="joint",
                                      x_update_mode="halo", halo=32))
    print(json.dumps({
        "metric": "spatial_halo32_max_err_vs_unsharded",
        "value": float(np.max(np.abs(halo - ref))),
        "unit": "max abs err",
    }), flush=True)


if __name__ == "__main__":
    main()
