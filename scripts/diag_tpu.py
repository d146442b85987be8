"""Round-3 NaN bisection ON THE TPU, replaying the round-2 training run.

The round-2 flagship run (scripts/train.py -c configs/train_local.json
-m 10 -M 20) produced NaN losses/metrics for every step (train_run.log).
The same model/init/equations are finite on CPU (scripts/diag_nan.py), so
this script replays the exact first batches on the real chip and bisects:

  stage data    : first batch finite on host?
  stage forward : jitted flagship forward at 256^2 finite?  If not,
                  capture_intermediates to name the first NaN layer.
  stage loss    : loss + each metric finite?
  stage grads   : value_and_grad finite?  per-leaf report.

Run (backgrounded, TPU compiles are slow):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag_tpu.py --stage forward
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def freport(tree, label):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    bad = []
    for path, leaf in flat:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            bad.append((name, int(np.isnan(a).sum()), int(np.isinf(a).sum()), a.size))
    print(f"[{label}] {'OK' if not bad else 'NON-FINITE (' + str(len(bad)) + ' leaves)'}",
          flush=True)
    for name, n_nan, n_inf, size in bad[:40]:
        print(f"    {name}: {n_nan} NaN, {n_inf} inf / {size}", flush=True)
    return not bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="forward",
                    choices=["data", "forward", "intermediates", "loss", "grads"])
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--batches", type=int, default=1)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)

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

    transforms = [RandCrop((args.hw, args.hw)), Scale(), AddAWGN(std_range=(10, 20), both=False)]
    dset = ImageDataset(Path("datasets/local_clean/train"), Path("datasets/local_clean/train"),
                        transforms=transforms)
    loader = DataLoader(dset, batch_size=1, shuffle=True, seed=0)
    it = iter(loader)
    batches = [next(it) for _ in range(args.batches)]
    for i, (bx, by) in enumerate(batches):
        ok = np.all(np.isfinite(bx)) and np.all(np.isfinite(by))
        print(f"[data b{i}] x[{bx.shape} {bx.dtype} {bx.min():.4f}..{bx.max():.4f}] "
              f"y[{by.min():.4f}..{by.max():.4f}] finite={ok}", flush=True)
    if args.stage == "data":
        return

    model = flagship_divergent_restorer()
    x = jnp.asarray(batches[0][0])
    y = jnp.asarray(batches[0][1])
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), x)
    params = jax.block_until_ready(params)
    print(f"init done in {time.time()-t0:.1f}s", flush=True)
    freport(params, "init params")

    if args.stage == "intermediates":
        t0 = time.time()
        out, mods = model.apply(params, x, capture_intermediates=True)
        inter = jax.device_get(mods["intermediates"])
        print(f"intermediates fetched in {time.time()-t0:.1f}s", flush=True)
        freport(inter, "intermediates")
        freport(out, "forward out")
        return

    fwd = jax.jit(model.apply)
    t0 = time.time()
    out = np.asarray(fwd(params, x))
    print(f"forward compiled+ran in {time.time()-t0:.1f}s; "
          f"out range {np.nanmin(out):.4f}..{np.nanmax(out):.4f}", flush=True)
    freport(out, "forward out")
    if args.stage == "forward":
        return

    loss_obj = SSIMLabColorLoss(None)
    metrics = [PSNRMetric(None), SCCMetric(None), SSIMMetric(None), MAELoss(None), UIQMetric(None)]

    @jax.jit
    def loss_and_metrics(p, xx, yy):
        o = model.apply(p, xx)
        return loss_obj(o, yy), {m.m_name: m(o, yy) for m in metrics}

    lv, mv = jax.device_get(loss_and_metrics(params, x, y))
    print(f"[loss] {lv}", flush=True)
    for k, v in mv.items():
        print(f"    {k}: {v}", flush=True)
    if args.stage == "loss":
        return

    def forward_loss(p, xx, yy):
        o = model.apply(p, xx)
        return loss_obj(o, yy)

    t0 = time.time()
    gfn = jax.jit(jax.value_and_grad(forward_loss))
    lv, grads = gfn(params, x, y)
    grads = jax.device_get(grads)
    print(f"grads compiled+ran in {time.time()-t0:.1f}s; loss={float(lv)}", flush=True)
    freport(grads, "grads")
    gmax = max(float(np.abs(np.asarray(g)).max())
               for g in jax.tree_util.tree_leaves(grads))
    print(f"grad max |.| = {gmax:.4e}", flush=True)


if __name__ == "__main__":
    main()
