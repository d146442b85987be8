"""Round-3 NaN bisection for the flagship training step.

Round-2's TPU run (train_run.log) produced NaN for every loss/metric from
epoch 0. This script reproduces the failure on CPU at small spatial size and
bisects: forward -> loss -> grads -> optimizer step -> clamped params ->
second forward. Run:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag_nan.py [--full]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def finite_report(tree, label):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    bad = []
    worst = 0.0
    for path, leaf in flat:
        a = np.asarray(leaf)
        amax = float(np.abs(a).max()) if a.size else 0.0
        worst = max(worst, amax if np.isfinite(amax) else np.inf)
        if not np.all(np.isfinite(a)):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            n_nan = int(np.isnan(a).sum())
            n_inf = int(np.isinf(a).sum())
            bad.append((name, n_nan, n_inf, a.size))
    status = "OK" if not bad else "NON-FINITE"
    print(f"[{label}] {status}; max|.| = {worst:.4e}")
    for name, n_nan, n_inf, size in bad[:20]:
        print(f"    {name}: {n_nan} NaN, {n_inf} inf of {size}")
    return not bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="use the real flagship config (slow)")
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--admm-iters", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from torch_admm_deconv_tpu.metrics import (
        MAELoss,
        PSNRMetric,
        SCCMetric,
        SSIMLabColorLoss,
        SSIMMetric,
        UIQMetric,
    )
    from torch_admm_deconv_tpu.models.denoiser import (
        DivergentRestorer,
        flagship_divergent_restorer,
    )
    from torch_admm_deconv_tpu.models.regularizers import (
        clip_grads_by_value,
        train_weight_clipper,
    )
    from torch_admm_deconv_tpu.train.trainer import make_optimizer

    admm = {"kern_size": (), "max_iters": args.admm_iters, "iso": True, "remat": True}
    if args.full:
        model = flagship_divergent_restorer()
    else:
        model = DivergentRestorer(
            level_branches=[2, 4],
            in_channels=3,
            final_channels=3,
            filters=16,
            gate_channels=16,
            attention_reduction=8,
            output_activation=jax.nn.sigmoid,
            admms=[dict(admm), dict(admm)],
            remat_levels=True,
        )

    rng = np.random.default_rng(123)
    clean = rng.random((1, 3, args.hw, args.hw), dtype=np.float32)
    sigma = 15.0 / 255.0
    noisy = np.clip(clean + sigma * rng.standard_normal(clean.shape).astype(np.float32), 0, 1)
    x = jnp.asarray(noisy)
    y = jnp.asarray(clean)

    params = model.init(jax.random.PRNGKey(args.seed), x)
    finite_report(params, "init params")
    for k in ("lmbda", "rho"):
        vals = [
            (("/".join(str(getattr(p, "key", p)) for p in path)), float(np.asarray(leaf)))
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
            if str(getattr(path[-1], "key", path[-1])) == k
        ]
        for name, v in vals:
            print(f"    {name} = {v:.6e}")

    loss_obj = SSIMLabColorLoss(None)
    metrics = [PSNRMetric(None), SCCMetric(None), SSIMMetric(None), MAELoss(None), UIQMetric(None)]

    def forward_loss(p, xx, yy):
        out = model.apply(p, xx)
        return loss_obj(out, yy), out

    out0 = model.apply(params, x)
    finite_report(out0, "forward(init)")
    lv0 = loss_obj(out0, y)
    print(f"[loss(init)] {float(lv0):.6f}")
    for m in metrics:
        print(f"    {m.m_name}: {float(m(out0, y)):.6f}")

    (lv, out), grads = jax.value_and_grad(forward_loss, has_aux=True)(params, x, y)
    ok = finite_report(grads, "raw grads")
    if not ok:
        # bisect which component of the loss NaNs the grads
        def only_ssim(p, xx, yy):
            from torch_admm_deconv_tpu.metrics import functional as F

            out = model.apply(p, xx)
            return 1.0 - F.ssim(out, yy, 1.0, 7)

        def only_lab(p, xx, yy):
            from torch_admm_deconv_tpu.metrics.color import rgb_to_lab

            out = model.apply(p, xx)
            return jnp.mean(jnp.abs(rgb_to_lab(out) - rgb_to_lab(yy)))

        def only_mse(p, xx, yy):
            out = model.apply(p, xx)
            return jnp.mean((out - yy) ** 2)

        for name, fn in [("ssim-only", only_ssim), ("lab-only", only_lab), ("mse-only", only_mse)]:
            g = jax.grad(fn)(params, x, y)
            finite_report(g, f"grads {name}")

    tx = make_optimizer(8.8e-4)
    opt_state = tx.init(params)
    for step in range(args.steps):
        (lv, out), grads = jax.value_and_grad(forward_loss, has_aux=True)(params, x, y)
        print(f"--- step {step}: loss = {float(lv):.6f}")
        finite_report(grads, f"step{step} grads")
        grads = clip_grads_by_value(grads, 1.0)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(8.8e-4, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        params = train_weight_clipper(params)
        finite_report(params, f"step{step} params after update+clamp")


if __name__ == "__main__":
    main()
