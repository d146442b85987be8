"""Megapixel spatially-tiled deblur demo (BASELINE.json config 5 shape).

Shards a large image's rows over a ``space`` mesh axis and runs the
distributed TV-ADMM solver (halo-exchange rolls + pencil FFT). On a machine
without 8 real chips, run on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/megapixel_demo.py --platform cpu --size 1024
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=2048)
    parser.add_argument("--platform", default=None, help="cpu to force the virtual mesh")
    parser.add_argument("--maxit", type=int, default=50)
    parser.add_argument("--adaptive", action="store_true")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.parallel import (
        make_mesh,
        spatial_admm_tv,
        spatial_admm_tv_adaptive,
    )

    n = len(jax.devices())
    mesh = make_mesh((n,), ("space",))
    print(f"devices: {n} x {jax.devices()[0].platform}")

    h = w = args.size
    assert h % n == 0
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 0.3 + 0.4 * ((yy // 128 + xx // 128) % 2)
    noisy = np.clip(img + 0.05 * rng.normal(size=img.shape), 0, 1).astype(np.float32)
    x = jnp.asarray(noisy[None, None])

    t0 = time.time()
    if args.adaptive:
        res = spatial_admm_tv_adaptive(x, 0.05, 1.0, None, maxit=args.maxit, tol=1e-4, mesh=mesh)
        out = np.asarray(res.x)
        print(
            f"adaptive spatial solve: {int(res.iters)} iters, r={float(res.r_norm):.2e}, "
            f"{time.time() - t0:.1f}s (incl. compile)"
        )
    else:
        out = np.asarray(spatial_admm_tv(x, 0.05, 1.0, None, maxit=args.maxit, mesh=mesh))
        print(f"fixed spatial solve: {args.maxit} iters, {time.time() - t0:.1f}s (incl. compile)")

    def psnr(a, b):
        return 10 * np.log10(1.0 / np.mean((a - b) ** 2))

    print(f"PSNR {psnr(noisy, img):.2f} -> {psnr(out[0, 0], img):.2f} dB on {h}x{w}")


if __name__ == "__main__":
    main()
