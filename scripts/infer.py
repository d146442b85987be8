"""Inference CLI: restore a file or folder of degraded images of ANY size.

The missing user-facing piece of the reference (its only inference lives in
notebooks on fixed 256x256 crops — /root/reference/notebooks/eval_algs.ipynb,
test_train.ipynb): restore real images at native resolution via the
overlap-discard tiler (torch_admm_deconv_tpu/infer.py), with either a
trained DivergentRestorer checkpoint or the classical TV-ADMM solver.

    python scripts/infer.py --input photos/ --output restored/ \
        --model classical --lmbd 0.05 --rho 1.0 --maxit 100
    python scripts/infer.py --input noisy.png --output out/ \
        --model divergent --ckpt trained_models/.../model_epoch..tar
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}


def _load(path: Path) -> np.ndarray:
    from PIL import Image

    im = Image.open(path).convert("RGB")
    return np.asarray(im, np.float32).transpose(2, 0, 1) / 255.0


def _save(path: Path, chw: np.ndarray):
    from PIL import Image

    arr = np.clip(chw * 255.0, 0, 255).astype(np.uint8).transpose(1, 2, 0)
    Image.fromarray(arr).save(path)


def main():
    p = argparse.ArgumentParser(description="Restore images (any size) with TV-ADMM / trained model")
    p.add_argument("--input", required=True, help="image file or directory")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--model", default="classical", choices=["classical", "divergent"])
    p.add_argument("--ckpt", default=None, help="checkpoint for --model divergent")
    p.add_argument("--lmbd", type=float, default=0.05)
    p.add_argument("--rho", type=float, default=1.0)
    p.add_argument("--maxit", type=int, default=100)
    p.add_argument("--aniso", action="store_true", help="anisotropic TV (default isotropic)")
    p.add_argument("--psf_gaussian", nargs=2, type=float, default=None,
                   metavar=("SIZE", "SIGMA"),
                   help="non-blind deblur with a SIZE x SIZE gaussian PSF of "
                        "std SIGMA (classical model only); margin must cover "
                        "the PSF radius + TV diffusion")
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--margin", type=int, default=32)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--no_pallas", action="store_true")
    args = p.parse_args()

    from torch_admm_deconv_tpu.infer import classical_restorer, model_restorer, restore_image

    src = Path(args.input)
    files = (
        sorted(q for q in src.iterdir() if q.suffix.lower() in IMG_EXTS)
        if src.is_dir()
        else [src]
    )
    if not files:
        sys.exit(f"no images found under {src}")
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.model == "divergent":
        if not args.ckpt:
            sys.exit("--model divergent requires --ckpt")
        apply_fn = model_restorer(args.ckpt)
    else:
        kern = None
        if args.psf_gaussian:
            size, sigma = int(args.psf_gaussian[0]), float(args.psf_gaussian[1])
            ax = np.arange(size) - (size - 1) / 2.0
            g = np.exp(-(ax**2) / (2.0 * sigma**2))
            k2 = np.outer(g, g)
            kern = (k2 / k2.sum()).reshape(1, 1, size, size).astype(np.float32)
        apply_fn = classical_restorer(
            args.lmbd, args.rho, args.maxit, iso=not args.aniso, kern=kern,
            use_pallas=not args.no_pallas
        )

    for f in files:
        img = _load(f)
        t0 = time.perf_counter()
        out = restore_image(
            apply_fn, img, tile=args.tile, margin=args.margin, max_batch=args.max_batch
        )
        dt = time.perf_counter() - t0
        dst = out_dir / (f.stem + "_restored.png")
        _save(dst, out)
        print(f"{f.name}: {img.shape[2]}x{img.shape[1]} -> {dst} ({dt:.2f}s)")


if __name__ == "__main__":
    main()
