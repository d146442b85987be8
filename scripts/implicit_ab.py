"""Implicit-gradient training for real: unroll-vs-implicit A/B on the chip.

VERDICT r4 weak #3 / task 3: the README claims the on-chip solve speedup
"applies to training, not just inference" via ``gradient_mode="implicit"``
(models/admm_deconv.py), but no training job had ever run in that mode.
This script trains the SAME reduced DivergentRestorer twice on one real
data batch stream — once backpropping through all unrolled solver
iterations (the reference's only mode,
/root/reference/src/admmtor/eops/deconv.py:103-115: autograd through the
100-iteration Python loop), once through the residual-stopped forward +
implicit-function-theorem adjoint (ops/implicit.py) — and records, for
each twin: compile wall time, per-step time (chained steps between host
fetches, tunnel-safe), peak HBM from XLA's memory analysis, and the
training-loss curve (both must DECREASE and stay finite — this is a real
training run, not a unit test).

The reduced variant ([2, 4] branches, 24 filters, 128^2 crops) keeps both
cold compiles inside one session; the gradient-mode plumbing is the exact
code path the flagship uses (models/denoiser.py flagship factory /
scripts/train.py --gradient_mode), so the comparison transfers.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/implicit_ab.py \
      [--steps 40] [--crop 128] [--max_iters 100] \
      [--out benchmarks/implicit_train_r5.md]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_model(gradient_mode: str, max_iters: int):
    from torch_admm_deconv_tpu.models.denoiser import DivergentRestorer

    admm = {
        "kern_size": (),
        "max_iters": max_iters,
        "iso": True,
        "remat": True,
        "gradient_mode": gradient_mode,
    }
    return DivergentRestorer(
        level_branches=[2, 4],
        in_channels=3,
        final_channels=3,
        filters=24,
        gate_channels=24,
        attention_reduction=4,
        admms=[dict(admm), dict(admm)],
        remat_levels=True,
    )


def run_mode(mode: str, args, batches):
    import jax
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.metrics import SSIMLabColorLoss
    from torch_admm_deconv_tpu.train import NNTrainer, make_optimizer

    model = build_model(mode, args.max_iters)
    trainer = NNTrainer(SSIMLabColorLoss(None), [], saver=None)
    tx = make_optimizer(args.lr)

    x0, _ = batches[0]
    print(f"[{mode}] init params ...", flush=True)
    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(0), x0)
    t_init = time.perf_counter() - t0
    opt_state = tx.init(params)
    train_step, _ = trainer._build_steps(model, tx)
    acc = trainer._fresh_acc("train")

    print(f"[{mode}] compiling train_step (cold) ...", flush=True)
    t0 = time.perf_counter()
    compiled = train_step.lower(params, opt_state, x0, x0, args.lr, acc).compile()
    t_compile = time.perf_counter() - t0
    peak_hbm = None
    try:
        ma = compiled.memory_analysis()
        peak_hbm = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                    + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    except Exception:
        pass
    print(f"[{mode}] compile {t_compile:.1f}s (init {t_init:.1f}s), "
          f"peak HBM {peak_hbm/1e9 if peak_hbm else float('nan'):.3f} GB",
          flush=True)

    # Real training: one pass over the batch list = the loss curve evidence.
    losses = []
    t_steps = []
    fence = time.perf_counter()
    for i, (x, y) in enumerate(batches):
        params, opt_state, lv, acc = train_step(params, opt_state, x, y,
                                                args.lr, acc)
        if (i + 1) % args.chain == 0 or i == len(batches) - 1:
            lvf = float(np.asarray(lv))  # host fetch fences the chain
            now = time.perf_counter()
            t_steps.append((now - fence) / args.chain)
            fence = now
            losses.append(lvf)
            print(f"[{mode}] step {i+1}/{len(batches)} loss={lvf:.5f}",
                  flush=True)
    # discard the first fenced chain (allocator settle + first dispatch)
    per_step = float(np.median(t_steps[1:])) if len(t_steps) > 1 else t_steps[0]
    finite = all(np.isfinite(l) for l in losses)
    return dict(mode=mode, t_init=t_init, t_compile=t_compile,
                peak_hbm=peak_hbm, per_step=per_step, losses=losses,
                finite=finite)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", "-c", default="configs/train_local.json")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--chain", type=int, default=8,
                    help="device-chained steps between host fetches")
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--max_iters", type=int, default=100)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--min_awgn", type=int, default=10)
    ap.add_argument("--max_awgn", type=int, default=20)
    ap.add_argument("--out", default="benchmarks/implicit_train_r5.md")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.data import (
        AddAWGN, DataLoader, ImageDataset, RandCrop, Scale,
    )

    cfg = json.load(open(args.config_file))
    transforms = [RandCrop((args.crop, args.crop)), Scale(),
                  AddAWGN(std_range=(args.min_awgn, args.max_awgn), both=False)]
    dset = ImageDataset(Path(cfg["train"]["x_path"]),
                        Path(cfg["train"]["y_path"]), transforms=transforms)
    loader = DataLoader(dset, batch_size=1, shuffle=True)
    it = iter(loader)
    batches = []
    while len(batches) < args.steps:
        try:
            x, y = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        batches.append((jnp.asarray(x), jnp.asarray(y)))

    results = [run_mode(m, args, batches) for m in ("unroll", "implicit")]
    un, im = results

    def curve(r):
        return " -> ".join(f"{l:.4f}" for l in r["losses"])

    speedup = un["per_step"] / im["per_step"]
    mem_ratio = (un["peak_hbm"] / im["peak_hbm"]
                 if un["peak_hbm"] and im["peak_hbm"] else float("nan"))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    dev = jax.devices()[0].device_kind
    out.write_text(f"""# Implicit-vs-unrolled ADMM training — real A/B on {dev}

Reduced DivergentRestorer ([2,4] branches, 24 filters, two {args.max_iters}-iter
iso ADMM layers), SSIMLabColorLoss, AdamW, batch 1 @ {args.crop}^2, {args.steps}
real optimizer steps per twin on identical data/seed. The gradient-mode
plumbing is the flagship's exact code path (scripts/train.py
--gradient_mode; models/admm_deconv.py:53). Reference contrast: the torch
model's ONLY mode is autograd through the full 100-iteration Python loop
(/root/reference/src/admmtor/eops/deconv.py:103-115).

| twin | compile (cold) | peak HBM | s/step | loss first->last | finite |
|---|---|---|---|---|---|
| unroll (reference mode) | {un['t_compile']:.1f} s | {un['peak_hbm']/1e9 if un['peak_hbm'] else float('nan'):.3f} GB | {un['per_step']:.3f} | {un['losses'][0]:.4f} -> {un['losses'][-1]:.4f} | {un['finite']} |
| implicit (IFT adjoint) | {im['t_compile']:.1f} s | {im['peak_hbm']/1e9 if im['peak_hbm'] else float('nan'):.3f} GB | {im['per_step']:.3f} | {im['losses'][0]:.4f} -> {im['losses'][-1]:.4f} | {im['finite']} |

**Step-time ratio (unroll/implicit): {speedup:.2f}x. Peak-HBM ratio: {mem_ratio:.2f}x.**

Loss curves (each point fences a {args.chain}-step device chain):

* unroll:   {curve(un)}
* implicit: {curve(im)}
""")
    print(json.dumps({"unroll_s_per_step": un["per_step"],
                      "implicit_s_per_step": im["per_step"],
                      "speedup": speedup, "hbm_ratio": mem_ratio,
                      "unroll_finite": un["finite"],
                      "implicit_finite": im["finite"]}))


if __name__ == "__main__":
    main()
