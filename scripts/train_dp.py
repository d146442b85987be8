"""Real multi-device DATA-PARALLEL training job (BASELINE config 4 as
written: "unrolled learned-ADMM (prox net z-update) training ... data-
parallel across hosts").

Trains :class:`LearnedProxADMM` through ``make_dp_train_step`` on a mesh of
ALL visible devices (the 8-virtual-device CPU mesh in this environment, a
real slice as-is): params/optimizer replicate, the batch shards over the
``data`` axis, and XLA inserts the gradient all-reduce from the global-mean
loss — the idiomatic JAX SPMD path (parallel/data_parallel.py). The default
configuration is the NON-BLIND DEBLUR protocol (9x9 Gaussian PSF sigma 1.5
circular blur + AWGN sigma 5/255 — the degradation of
data/transforms.CircBlur matches the solver's own circulant H), with the
denoising protocol available via --blur_gaussian 0.

The reference has no distributed code of any kind (SURVEY.md §2.5) and no
deblur training path; both halves of this script are beyond-reference.

Usage (CPU mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/train_dp.py --platform cpu --epochs 30
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, help="cpu forces the virtual mesh")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=8.8e-4)
    p.add_argument("--global_batch", type=int, default=8,
                   help="sharded over the data axis; must divide the mesh size")
    p.add_argument("--train_dir", default="datasets/local_clean/train")
    p.add_argument("--eval_dir", default="datasets/local_clean/eval")
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--blur_gaussian", type=float, default=1.5,
                   help="deblur protocol PSF sigma (0 = denoise protocol)")
    p.add_argument("--blur_ksize", type=int, default=9)
    p.add_argument("--awgn", type=int, default=5)
    p.add_argument("--steps", type=int, default=10, help="unrolled ADMM stages")
    p.add_argument("--save_dir", default="trained_models")
    p.add_argument("--model_name", default="learned_prox_deblur_dp")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.data import (
        AddAWGN,
        CircBlur,
        DataLoader,
        ImageDataset,
        RandCrop,
        Scale,
        gaussian_psf_np,
    )
    from torch_admm_deconv_tpu.metrics import SSIMLabColorLoss
    from torch_admm_deconv_tpu.models.learned_prox import default_learned_prox
    from torch_admm_deconv_tpu.parallel import make_dp_train_step, make_mesh, shard_batch
    from torch_admm_deconv_tpu.train import NNSaver, make_optimizer

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,), ("data",))
    assert args.global_batch % n_dev == 0, (args.global_batch, n_dev)
    print(f"[dp] mesh: {n_dev} devices on axis 'data'; global batch "
          f"{args.global_batch} ({args.global_batch // n_dev}/device)", flush=True)

    transforms = [RandCrop(args.crop), Scale()]
    psf = None
    if args.blur_gaussian > 0:
        psf = gaussian_psf_np(args.blur_ksize, args.blur_gaussian)
        transforms.append(CircBlur(psf))
    if args.awgn > 0:
        transforms.append(AddAWGN(std_range=(args.awgn, args.awgn + 1)))
    train_dset = ImageDataset(Path(args.train_dir), Path(args.train_dir), transforms=transforms)
    eval_dset = ImageDataset(Path(args.eval_dir), Path(args.eval_dir), transforms=transforms)
    train_loader = DataLoader(train_dset, batch_size=args.global_batch, shuffle=True)
    eval_loader = DataLoader(eval_dset, batch_size=1, shuffle=False, seed=0, drop_last=False)

    model = default_learned_prox(
        kern=args.blur_ksize if psf is not None else 0, steps=args.steps, psf=psf
    )
    loss_fn = SSIMLabColorLoss()

    first_x, _ = next(iter(train_loader))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(first_x))
    tx = make_optimizer(args.lr)
    opt_state = tx.init(params)
    step = make_dp_train_step(model, tx, loss_fn, mesh, axis="data")
    eval_apply = jax.jit(lambda p, x: model.apply(p, x))

    saver = NNSaver(args.save_dir, args.model_name)
    best = float("inf")
    for epoch in range(args.epochs):
        t0 = time.time()
        n_steps = 0
        train_loss = 0.0
        for x, y in train_loader:
            if x.shape[0] != args.global_batch:
                continue  # keep one compiled shape
            xs = shard_batch(jnp.asarray(x), mesh, "data")
            ys = shard_batch(jnp.asarray(y), mesh, "data")
            params, opt_state, lv = step(params, opt_state, xs, ys, args.lr)
            train_loss += float(lv)
            n_steps += 1
        # eval: loss + PSNR-from-mean-MSE (the reference's epoch metric)
        ev_loss, ev_mse, n_ev = 0.0, 0.0, 0
        for x, y in eval_loader:
            out = eval_apply(params, jnp.asarray(x))
            yj = jnp.asarray(y)
            ev_loss += float(loss_fn(out, yj))
            ev_mse += float(jnp.mean((out - yj) ** 2))
            n_ev += 1
        ev_loss /= n_ev
        psnr = 10 * np.log10(1.0 / (ev_mse / n_ev))
        print(f"[dp] epoch {epoch}: train_loss {train_loss / max(n_steps, 1):.4f} "
              f"({n_steps} dp steps), eval_loss {ev_loss:.4f}, eval_psnr "
              f"{psnr:.2f} dB, {time.time() - t0:.1f}s", flush=True)
        if ev_loss < best:
            best = ev_loss
            saver.save_model(epoch, params, opt_state, ev_loss)
    print(f"[dp] done; best eval loss {best:.4f}", flush=True)


if __name__ == "__main__":
    main()
