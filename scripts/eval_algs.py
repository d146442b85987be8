"""Quantitative benchmark harness — the script form of the reference's
notebooks/eval_algs.ipynb (SURVEY.md §3.4).

Per eval image: run the trained restoration model (and optionally the
classical TV-ADMM solver, a NAFNet checkpoint, and BM3D when the ``bm3d``
package exists — it is not in this environment, so it is gated exactly like
the reference's undeclared deps); compute per-image SSIM / PSNR / SCC /
UIQ / MSE; write clean/noisy/restored PNGs and a per-method metrics.csv;
print the notebook's summary stats (mean SSIM/UIQ/SCC, PSNR from mean MSE —
eval_algs.ipynb cell 12).
"""

from __future__ import annotations

import argparse
import csv
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _to_png(path: Path, chw: np.ndarray):
    from PIL import Image

    arr = np.clip(chw * 255.0, 0, 255).astype(np.uint8).transpose(1, 2, 0)
    Image.fromarray(arr.squeeze() if arr.shape[-1] == 1 else arr).save(path)


def run_bm3d(noisy_chw: np.ndarray):
    """The reference's BM3D column (eval_algs.ipynb cell 3): estimate sigma,
    denoise with BM3D. Uses the pip ``bm3d`` package when present (the
    reference's own undeclared dep); otherwise falls back to the repo's
    from-scratch NumPy implementation (ops/bm3d.py) so the three-column
    benchmark completes with zero external deps."""
    hwc = noisy_chw.transpose(1, 2, 0)
    try:
        import bm3d
        from skimage.restoration import estimate_sigma

        sigma = float(np.mean(estimate_sigma(hwc, channel_axis=-1)))
        return bm3d.bm3d(hwc, sigma, profile="deb").transpose(2, 0, 1)
    except ImportError:
        from torch_admm_deconv_tpu.ops.bm3d import bm3d, estimate_sigma

        sigma = estimate_sigma(hwc, channel_axis=-1)
        return bm3d(hwc, sigma).transpose(2, 0, 1).astype(np.float32)


def main():
    parser = argparse.ArgumentParser(description="Evaluate restoration methods")
    parser.add_argument("--x_dir", required=True, help="degraded inputs dir")
    parser.add_argument("--y_dir", required=True, help="clean targets dir")
    parser.add_argument("--save_path", default="eval_out")
    parser.add_argument("--ckpt", default=None, help="trained model checkpoint (.tar)")
    parser.add_argument("--model", default="divergent",
                        choices=["divergent", "classical", "learned_prox"],
                        help="divergent: DivergentRestorer ckpt; classical: TV-ADMM "
                             "solver; learned_prox: LearnedProxADMM ckpt (10-step "
                             "unrolled PnP, BASELINE config 4)")
    parser.add_argument("--crop", type=int, default=256)
    parser.add_argument("--awgn", type=int, default=15, help="AWGN sigma added to x (0=off)")
    parser.add_argument("--lmbd", type=float, default=0.05)
    parser.add_argument("--rho", type=float, default=1.0)
    parser.add_argument("--maxit", type=int, default=100)
    parser.add_argument("--model_cfg", default=None,
                        help="json with level_branches/filters/... for the ckpt model")
    parser.add_argument("--nafnet_ckpt", default=None,
                        help="optional NAFNet comparison checkpoint (.tar)")
    parser.add_argument("--nafnet_width", type=int, default=64)
    parser.add_argument("--device", choices=["tpu", "cpu"], default="tpu")
    parser.add_argument("--lp_kern", type=int, default=0,
                        help="learned_prox PSF size (must match the ckpt)")
    parser.add_argument("--lp_psf_sigma", type=float, default=0.0,
                        help="learned_prox fixed-Gaussian PSF sigma (must "
                             "match the ckpt; 0 = learnable/denoise)")
    parser.add_argument("--blur_gaussian", type=float, default=0.0,
                        help="Circularly blur inputs with a Gaussian PSF of "
                             "this sigma (deblur protocol); the classical "
                             "solver then runs non-blind with the true PSF")
    parser.add_argument("--blur_ksize", type=int, default=9)
    parser.add_argument("--bm3d", action=argparse.BooleanOptionalAction, default=True,
                        help="include the BM3D column (pip bm3d when "
                             "importable, else the from-scratch ops/bm3d.py); "
                             "--no-bm3d skips it for quick runs")
    args = parser.parse_args()

    import jax

    if args.device != "tpu":
        jax.config.update("jax_platforms", args.device)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.data import AddAWGN, DataLoader, ImageDataset, RandCrop, Scale
    from torch_admm_deconv_tpu.metrics import functional as F
    from torch_admm_deconv_tpu.ops.solver import admm_tv
    from torch_admm_deconv_tpu.train import load_checkpoint

    save = Path(args.save_path)
    save.mkdir(parents=True, exist_ok=True)

    transforms = [RandCrop(args.crop), Scale()]
    solver_psf = None
    if args.blur_gaussian > 0:
        from torch_admm_deconv_tpu.data import CircBlur, gaussian_psf_np

        psf_np = gaussian_psf_np(args.blur_ksize, args.blur_gaussian)
        transforms.append(CircBlur(psf_np))
        solver_psf = jnp.asarray(psf_np.reshape(1, 1, *psf_np.shape))
    if args.awgn > 0:
        transforms.append(AddAWGN(std_range=(args.awgn, args.awgn + 1)))
    dset = ImageDataset(Path(args.x_dir), Path(args.y_dir), transforms=transforms)
    loader = DataLoader(dset, batch_size=1, shuffle=False, seed=0, drop_last=False)

    model_apply = None
    if args.model == "divergent" and args.ckpt:
        import json

        from torch_admm_deconv_tpu.models.denoiser import (
            DivergentRestorer,
            flagship_divergent_restorer,
        )

        use_pallas = args.device == "tpu"  # interpret-mode Pallas is unusable on CPU
        if args.model_cfg:
            cfg = json.load(open(args.model_cfg))
            # inference: no remat, VMEM fast path for the empty-kernel solves
            admm = {"kern_size": (), "max_iters": cfg.get("admm_iters", 100), "iso": True,
                    "remat": False, "use_pallas": use_pallas}
            model = DivergentRestorer(
                level_branches=cfg.get("level_branches", [2, 8, 32]),
                in_channels=3, final_channels=3,
                filters=cfg.get("filters", 86),
                gate_channels=cfg.get("filters", 86),
                attention_reduction=cfg.get("attention_reduction", 8),
                output_activation=jax.nn.sigmoid,
                admms=[dict(admm), dict(admm)],
            )
        else:
            model = flagship_divergent_restorer(remat=False, use_pallas=use_pallas)
        params = jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(args.ckpt)["model_state_dict"]
        )
        # params as an ARGUMENT, not a closure: closed-over weights become
        # jaxpr constants and ship inside the compile request — a w64-sized
        # model exceeds the remote compile helper's body limit (HTTP 413)
        _apply = jax.jit(lambda p, x: model.apply(p, x))
        model_apply = lambda x: _apply(params, x)  # noqa: E731

    if args.model == "learned_prox" and args.ckpt:
        # shared factory with scripts/train.py => identical param tree
        from torch_admm_deconv_tpu.data.transforms import gaussian_psf_np as _gp
        from torch_admm_deconv_tpu.models.learned_prox import default_learned_prox

        lp_psf = _gp(args.lp_kern, args.lp_psf_sigma) if (
            args.lp_kern and args.lp_psf_sigma > 0) else None
        lp = default_learned_prox(kern=args.lp_kern, psf=lp_psf)
        lp_params = jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(args.ckpt)["model_state_dict"]
        )
        _lp_apply = jax.jit(lambda p, x: lp.apply(p, x))
        model_apply = lambda x: _lp_apply(lp_params, x)  # noqa: E731

    nafnet_apply = None
    if args.nafnet_ckpt:
        from torch_admm_deconv_tpu.models.nafnet import NAFNet

        nafnet = NAFNet(
            img_channel=3, width=args.nafnet_width, middle_blk_num=12,
            enc_blk_nums=[2, 2, 4, 8], dec_blk_nums=[2, 2, 2, 2],
        )  # the comparison config of eval_algs.ipynb cell 2
        nf_params = jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(args.nafnet_ckpt)["model_state_dict"]
        )
        _nf_apply = jax.jit(lambda p, x: nafnet.apply(p, x))
        nafnet_apply = lambda x: _nf_apply(nf_params, x)  # noqa: E731

    metric_fns = {
        "ssim": lambda p, t: F.ssim(p, t),
        "psnr": lambda p, t: F.psnr(p, t),
        "scc": lambda p, t: F.scc(p, t),
        "uiq": lambda p, t: F.uiq(p, t),
        "mse": lambda p, t: F.mse(p, t),
    }
    metric_fns = {k: jax.jit(v) for k, v in metric_fns.items()}

    methods = ["admm" if args.model == "classical" or model_apply is None else "model"]
    if args.bm3d and args.blur_gaussian == 0:
        # BM3D is a denoiser; the deblur protocol has no BM3D column
        methods.append("bm3d")

    rows = []
    t_start = time.time()
    for i, (x, y) in enumerate(loader):
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        outs = {}
        if model_apply is not None and args.model in ("divergent", "learned_prox"):
            outs["model"] = model_apply(xj)
        else:
            # non-blind when the deblur protocol is on (true PSF), TV denoise
            # otherwise; aniso TV for deblur matches the grid-sweep protocol
            outs["admm"] = admm_tv(xj, args.lmbd, args.rho, solver_psf,
                                   iso=solver_psf is None, maxit=args.maxit)
        if nafnet_apply is not None:
            outs["nafnet"] = nafnet_apply(xj)
        if "bm3d" in methods:
            outs["bm3d"] = jnp.asarray(run_bm3d(np.asarray(x[0])))[None]

        _to_png(save / f"{i:03d}_clean.png", np.asarray(y[0]))
        _to_png(save / f"{i:03d}_noisy.png", np.asarray(x[0]))
        for name, out in outs.items():
            _to_png(save / f"{i:03d}_{name}.png", np.asarray(out[0]))
            row = {"image": i, "method": name}
            for mk, mf in metric_fns.items():
                row[mk] = float(mf(out, yj))
            rows.append(row)
    wall = time.time() - t_start

    with open(save / "metrics.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["image", "method", "ssim", "psnr", "scc", "uiq", "mse"])
        writer.writeheader()
        writer.writerows(rows)

    # notebook-style summary: mean SSIM/UIQ/SCC, PSNR from mean MSE
    for method in sorted({r["method"] for r in rows}):
        sel = [r for r in rows if r["method"] == method]
        mean_mse = float(np.mean([r["mse"] for r in sel]))
        print(
            f"{method}: SSIM={np.mean([r['ssim'] for r in sel]):.4f} "
            f"UIQ={np.mean([r['uiq'] for r in sel]):.4f} "
            f"SCC={np.mean([r['scc'] for r in sel]):.4f} "
            f"PSNR(from mean MSE)={10 * np.log10(1.0 / mean_mse):.3f} dB "
            f"({len(sel)} images, {wall / max(len(loader), 1):.2f} s/image)"
        )


if __name__ == "__main__":
    main()
