"""Solver smoke demo — the script form of the reference's
notebooks/test_torch_admm.ipynb: blur + noise an image, run the classical
TV-ADMM solver with the matching PSF, report PSNR before/after, save PNGs.

Usage: python examples/solver_demo.py [image.png] [--out /tmp/solver_demo]
Falls back to a synthetic piecewise-smooth image when no input is given.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthetic_image(h=256, w=256):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 0.25 + 0.5 * ((yy > h // 3) & (xx > w // 4))
    img = img + 0.2 * (((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 4) ** 2)
    return np.clip(np.stack([img, img * 0.9, img * 0.8]), 0, 1).astype(np.float32)


def gaussian_psf(size=7, sigma=1.5):
    ax = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return (k / k.sum()).reshape(1, 1, size, size).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("image", nargs="?", default=None)
    parser.add_argument("--out", default="/tmp/solver_demo")
    parser.add_argument("--maxit", type=int, default=300)
    parser.add_argument("--sigma_noise", type=float, default=0.01)
    args = parser.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from tests.oracles.numpy_admm import htran
    from torch_admm_deconv_tpu import admm_tv, admm_tv_adaptive

    if args.image:
        arr = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
        clean = arr.transpose(2, 0, 1)
    else:
        clean = synthetic_image()

    psf = gaussian_psf()
    blurred = htran(clean[None], np.flip(psf, axis=(-2, -1)))[0]
    rng = np.random.default_rng(0)
    noisy = np.clip(blurred + args.sigma_noise * rng.normal(size=blurred.shape), 0, 1).astype(
        np.float32
    )

    def psnr(a, b):
        return 10 * np.log10(1.0 / np.mean((a - b) ** 2))

    xin = jnp.asarray(noisy[None])
    kern = jnp.asarray(psf)
    restored = np.asarray(admm_tv(xin, 0.002, 0.5, kern, iso=True, maxit=args.maxit))[0]
    res = admm_tv_adaptive(xin, 0.002, 0.5, kern, tol=1e-4, maxit=args.maxit)

    print(f"degraded PSNR:  {psnr(noisy, clean):.2f} dB")
    print(f"restored PSNR:  {psnr(restored, clean):.2f} dB ({args.maxit} fixed iters)")
    print(
        f"adaptive:       {psnr(np.asarray(res.x)[0], clean):.2f} dB "
        f"({int(res.iters)} iters to r={float(res.r_norm):.1e})"
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for name, im in [("clean", clean), ("degraded", noisy), ("restored", restored)]:
        Image.fromarray(
            (np.clip(im, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        ).save(out / f"{name}.png")
    print(f"images written to {out}")


if __name__ == "__main__":
    main()
