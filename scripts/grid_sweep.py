"""Classical-solver rho/lambda grid sweep with PSNR/SSIM eval — BASELINE.json
config 3 ("batched deconv sweep over rho/lambda grid, PSNR/SSIM eval").

No training involved: this establishes the *classical* TV-ADMM quality
anchor next to the reference's trained-model table
(/root/reference/notebooks/eval_algs.ipynb cells 14-18; BASELINE.md). Two
degradations:

* ``denoise``: AWGN sigma/255, empty kernel (the reference's trained-model
  eval protocol — pure TV denoising mode, eops/deconv.py:46-47);
* ``deblur``: 9x9 Gaussian PSF circular blur + AWGN (the non-blind config).

TPU-native shape: ONE jitted solve with traced (lmbda, rho) scalars serves
every grid point (no recompiles); the whole eval set runs as a single batch
through the MXU-DFT x-update. Writes ``grid_results.csv`` and prints the
best cell in the notebook summary format (mean SSIM/UIQ/SCC, PSNR from
mean MSE).
"""

from __future__ import annotations

import argparse
import csv
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description="rho/lambda grid sweep")
    parser.add_argument("--y_dir", default="datasets/local_clean/eval")
    parser.add_argument("--save_path", default="eval_out/grid")
    parser.add_argument("--mode", choices=["denoise", "deblur"], default="denoise")
    parser.add_argument("--crop", type=int, default=256)
    parser.add_argument("--awgn", type=float, default=15.0)
    parser.add_argument("--maxit", type=int, default=100)
    parser.add_argument("--lmbd_grid", default="0.002,0.005,0.01,0.02,0.04,0.08,0.15")
    parser.add_argument("--rho_grid", default="0.05,0.1,0.25,0.5,1.0,2.0,4.0")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    args = parser.parse_args()

    import jax

    if args.device != "tpu":
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from torch_admm_deconv_tpu.data import DataLoader, ImageDataset, RandCrop, Scale
    from torch_admm_deconv_tpu.metrics import functional as F
    from torch_admm_deconv_tpu.ops.solver import admm_tv

    # -- assemble the full eval batch (deterministic crops + noise) --------
    dset = ImageDataset(Path(args.y_dir), Path(args.y_dir),
                        transforms=[RandCrop(args.crop), Scale()])
    loader = DataLoader(dset, batch_size=1, shuffle=False, seed=args.seed,
                        drop_last=False)
    clean = np.concatenate([np.asarray(y) for _, y in loader], axis=0)

    rng = np.random.default_rng(args.seed)
    kern = None
    degraded = clean
    if args.mode == "deblur":
        # 9x9 gaussian PSF, circular blur via the solver's own conv operator
        from tests.oracles.numpy_admm import gaussian_psf

        k = gaussian_psf(9, 1.5)[0, 0].astype(np.float32)
        kern = jnp.asarray(k)[None, None]
        K = np.fft.rfft2(np.roll(np.pad(k, ((0, args.crop - 9),) * 2), (-4, -4), (0, 1)))
        degraded = np.fft.irfft2(
            np.fft.rfft2(clean, axes=(2, 3)) * K, s=clean.shape[2:], axes=(2, 3)
        ).astype(np.float32)
    noisy = np.clip(
        degraded + (args.awgn / 255.0) * rng.standard_normal(degraded.shape), 0.0, 1.0
    ).astype(np.float32)

    x = jnp.asarray(noisy)
    y = jnp.asarray(clean)

    # -- one compile serves the whole grid: lmbd/rho are traced scalars ----
    @jax.jit
    def solve_and_score(lmbd, rho):
        out = admm_tv(x, lmbd, rho, kern, iso=True, maxit=args.maxit)
        out = jnp.clip(out, 0.0, 1.0)
        per_im_mse = jnp.mean((out - y) ** 2, axis=(1, 2, 3))
        return {
            "ssim": F.ssim(out, y),
            "uiq": F.uiq(out, y),
            "scc": F.scc(out, y),
            "mean_mse": jnp.mean(per_im_mse),
        }

    lmbds = [float(v) for v in args.lmbd_grid.split(",")]
    rhos = [float(v) for v in args.rho_grid.split(",")]
    rows = []
    t0 = time.time()
    for lmbd in lmbds:
        for rho in rhos:
            s = {k: float(v) for k, v in solve_and_score(lmbd, rho).items()}
            s["psnr_from_mean_mse"] = 10.0 * np.log10(1.0 / s.pop("mean_mse"))
            rows.append({"lmbd": lmbd, "rho": rho, **s})
    wall = time.time() - t0

    save = Path(args.save_path)
    save.mkdir(parents=True, exist_ok=True)
    out_csv = save / f"grid_{args.mode}_awgn{int(args.awgn)}.csv"
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    noisy_psnr = 10.0 * np.log10(1.0 / float(np.mean((noisy - clean) ** 2)))
    best = max(rows, key=lambda r: r["psnr_from_mean_mse"])
    print(f"[grid] {args.mode} awgn={args.awgn} images={clean.shape[0]} "
          f"grid={len(lmbds)}x{len(rhos)} wall={wall:.1f}s -> {out_csv}")
    print(f"[grid] degraded input: PSNR={noisy_psnr:.3f} dB")
    print(f"[grid] best: lmbd={best['lmbd']} rho={best['rho']} "
          f"SSIM={best['ssim']:.4f} UIQ={best['uiq']:.4f} SCC={best['scc']:.4f} "
          f"PSNR(from mean MSE)={best['psnr_from_mean_mse']:.3f} dB")


if __name__ == "__main__":
    main()
