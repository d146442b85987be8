import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_admm_deconv_tpu import models as M
from torch_admm_deconv_tpu.metrics import MSE, PSNRMetric, SSIMLoss
from torch_admm_deconv_tpu.train import (
    MetricsLogger,
    NNSaver,
    NNTrainer,
    SaveMode,
    cosine_annealing_warm_restarts,
    load_checkpoint,
    make_optimizer,
)


def test_cosine_warm_restarts_matches_torch():
    torch = pytest.importorskip("torch")
    base, t0, eta = 0.1, 10, 1e-5
    sched = cosine_annealing_warm_restarts(base, t0, eta_min=eta)
    m = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(m.parameters(), lr=base)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=t0, eta_min=eta)
    for step in range(25):
        want = tsched.get_last_lr()[0]
        got = float(sched(step))
        assert math.isclose(got, want, rel_tol=1e-5), (step, got, want)
        opt.step()
        tsched.step()


def test_logger_psnr_from_mean_mse():
    loss = SSIMLoss("cpu")
    logger = MetricsLogger(loss, [PSNRMetric("cpu")])
    # psnr requested => mse auto-registered
    assert "mse" in logger.tracked
    logger.update_step_metric_val("mse", 0.01)
    logger.update_step_metric_val("mse", 0.04)
    logger.update_step_metric_val("psnr", 20.0)
    logger.update_step_metric_val("psnr", 14.0)
    logger.update_step_metric_val(loss.m_name, 0.5)
    logger("train")
    avg = logger.get_avg_metrics("train")
    # PSNR from MEAN mse (0.025) = 16.02dB, not mean of per-step PSNRs (17)
    np.testing.assert_allclose(avg["psnr"], 10 * np.log10(1 / 0.025), rtol=1e-6)


def test_logger_nan_step_excluded_from_mean():
    """Round-3 hardening: a NaN step must not poison the epoch average."""
    loss = SSIMLoss("cpu")
    logger = MetricsLogger(loss, [])
    logger.update_step_metric_val(loss.m_name, 0.5)
    logger.update_step_metric_val(loss.m_name, float("nan"))
    logger.update_step_metric_val(loss.m_name, 0.7)
    logger("train")
    avg = logger.get_avg_metrics("train")
    np.testing.assert_allclose(avg[loss.m_name], 0.6, rtol=1e-6)
    # all-NaN epoch still reports NaN (nothing to average)
    logger.reinit_step_stats()
    logger.update_step_metric_val(loss.m_name, float("inf"))
    logger("train")
    assert math.isnan(logger.get_avg_metrics("train")[loss.m_name])


def test_logger_push_step_sums():
    """On-device accumulator path: sums + finite counts fold to the same
    means the per-step path produces."""
    loss = SSIMLoss("cpu")
    logger = MetricsLogger(loss, [PSNRMetric("cpu")])
    logger.push_step_sums(
        {loss.m_name: 1.2, "mse": 0.05, "psnr": 34.0},
        {loss.m_name: 2, "mse": 2, "psnr": 2},
    )
    logger("train")
    avg = logger.get_avg_metrics("train")
    np.testing.assert_allclose(avg[loss.m_name], 0.6, rtol=1e-6)
    np.testing.assert_allclose(avg["psnr"], 10 * np.log10(1 / 0.025), rtol=1e-6)


def test_saver_nan_loss_never_best(tmp_path):
    """A NaN epoch-0 loss must neither save nor disable later best-saves
    (fixes the reference's saver.py:37-44 NaN poisoning, hit in round 2)."""
    saver = NNSaver(str(tmp_path), "m", SaveMode.Best, use_time_date=False)
    params = {"w": jnp.ones((2,))}
    saver.save_on_epoch_end(0, params, {}, float("nan"))  # no save
    assert list((tmp_path / "m").glob("*.tar")) == []
    saver.save_on_epoch_end(1, params, {}, 0.9)  # first finite: save
    saver.save_on_epoch_end(2, params, {}, float("inf"))  # no save, no poison
    saver.save_on_epoch_end(3, params, {}, 0.5)  # strictly better: save
    files = sorted(p.name for p in (tmp_path / "m").glob("*.tar"))
    assert files == ["m_epoch01_vloss0.9000.tar", "m_epoch03_vloss0.5000.tar"]


def test_trainer_nonfinite_loss_detected(tmp_path, capsys):
    """The trainer counts non-finite step losses on-device, warns, and can
    raise; finite metrics from other steps still average correctly."""

    class _NaNBombLoss(MSE):
        m_name = "nanbomb"

        def __call__(self, y_pred, y_true):
            # NaN whenever the batch mean of y_true exceeds a threshold —
            # deterministic, jit-compatible, hits some batches only
            base = jnp.mean((y_pred - y_true) ** 2)
            return jnp.where(jnp.mean(y_true) > 0.5, jnp.nan, base)

    model = M.Conv2d(3, 3, 1)
    loss = _NaNBombLoss("cpu")
    loader = _SyntheticLoader(n_batches=4)
    n_bad_expected = sum(1 for _, y in loader if float(np.mean(y)) > 0.5)
    assert 0 < n_bad_expected < 4, "fixture should mix finite and NaN steps"
    logger = MetricsLogger(loss, [])
    trainer = NNTrainer(loss, [], None, logger)
    trainer.run(model, make_optimizer(1e-3), epochs=1, train_dataloader=loader,
                eval_dataloader=loader, base_lr=1e-3)
    out = capsys.readouterr().out
    assert "non-finite loss" in out
    assert math.isfinite(logger.get_avg_metrics("train")[loss.m_name])

    trainer2 = NNTrainer(loss, [], None, MetricsLogger(loss, []), on_nonfinite="raise")
    with pytest.raises(FloatingPointError):
        trainer2.run(model, make_optimizer(1e-3), epochs=1, train_dataloader=loader,
                     eval_dataloader=loader, base_lr=1e-3)


def test_saver_best_mode_strictness(tmp_path):
    saver = NNSaver(str(tmp_path), "m", SaveMode.Best, use_time_date=False)
    params = {"w": jnp.ones((2,))}
    saver.save_on_epoch_end(0, params, {}, 1.0)
    saver.save_on_epoch_end(1, params, {}, 1.5)  # worse: no save
    saver.save_on_epoch_end(2, params, {}, 0.5)  # strictly better than all: save
    saver.save_on_epoch_end(3, params, {}, 0.7)  # not better than 0.5: no save
    files = sorted(p.name for p in (tmp_path / "m").glob("*.tar"))
    assert files == ["m_epoch00_vloss1.0000.tar", "m_epoch02_vloss0.5000.tar"]


def test_saver_checkpoint_roundtrip(tmp_path):
    saver = NNSaver(str(tmp_path), "m", SaveMode.Each, use_time_date=False)
    params = {"dense": {"kernel": jnp.arange(4.0).reshape(2, 2)}}
    path = saver.save_model(3, params, {"count": jnp.asarray(7)}, 0.25)
    restored = load_checkpoint(path)
    assert restored["epoch"] == 3
    np.testing.assert_allclose(
        restored["model_state_dict"]["dense"]["kernel"], np.arange(4.0).reshape(2, 2)
    )
    assert restored["loss"] == 0.25


class _SyntheticLoader:
    """Deterministic denoising toy: y clean, x noisy."""

    def __init__(self, n_batches=3, batch=2, ch=3, size=16, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = []
        for _ in range(n_batches):
            y = rng.random((batch, ch, size, size)).astype(np.float32)
            x = np.clip(y + 0.1 * rng.standard_normal(y.shape), 0, 1).astype(np.float32)
            self.batches.append((x, y))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def test_skip_nonfinite_updates_guard():
    """With skip_nonfinite_updates=True, a step whose loss/grads are
    non-finite must leave params AND optimizer state bit-identical (no
    NaN-poisoning), while finite steps update normally (round-3 hardening
    after the flagship run diverged mid-epoch and every later step was
    NaN)."""
    import flax.linen as nn

    from torch_admm_deconv_tpu.metrics.losses import MSE
    from torch_admm_deconv_tpu.train.trainer import NNTrainer, make_optimizer

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = self.param("w", lambda k, s: jnp.ones(s, jnp.float32), (1,))
            return x * w

    model = Lin()
    x = jnp.ones((1, 1, 4, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    tx = make_optimizer(1e-2)
    trainer = NNTrainer(
        MSE(None), [], saver=None, clamp_admm_params=False,
        skip_nonfinite_updates=True,
    )
    train_step, _ = trainer._build_steps(model, tx)
    opt_state = tx.init(params)
    acc = trainer._fresh_acc()

    bad_y = jnp.full_like(x, jnp.nan)
    p1, o1, lv1, acc = train_step(params, opt_state, x, bad_y, 1e-2, acc)
    assert not np.isfinite(float(lv1))
    # no poisoned update applied: params bit-identical
    np.testing.assert_array_equal(
        np.asarray(p1["params"]["w"]), np.asarray(params["params"]["w"])
    )

    p2, o2, lv2, acc = train_step(p1, o1, x, jnp.zeros_like(x), 1e-2, acc)
    assert np.isfinite(float(lv2))
    assert float(jnp.abs(p2["params"]["w"] - params["params"]["w"]).max()) > 0

    host = jax.device_get(acc)
    assert int(host["nonfinite_steps"]) == 1


def test_trainer_end_to_end_loss_decreases(tmp_path):
    model = M.DivergentRestorer(
        level_branches=[2, 2], in_channels=3, final_channels=3, filters=6,
        gate_channels=6, attention_reduction=2, output_activation=jax.nn.sigmoid,
        admms=[{"kern_size": (), "max_iters": 2, "iso": True}] * 2,
    )
    loss = SSIMLoss("cpu")
    metrics = [PSNRMetric("cpu"), MSE("cpu")]
    saver = NNSaver(str(tmp_path), "tiny", SaveMode.Each, use_time_date=False)
    logger = MetricsLogger(loss, metrics)
    trainer = NNTrainer(loss, metrics, saver, logger)
    train_loader = _SyntheticLoader(n_batches=4)
    eval_loader = _SyntheticLoader(n_batches=2, seed=1)
    trainer.run(
        model,
        make_optimizer(3e-3),
        epochs=3,
        train_dataloader=train_loader,
        eval_dataloader=eval_loader,
        base_lr=3e-3,
    )
    train_losses = logger.metrics["train"][loss.m_name]
    assert len(train_losses) == 3
    assert train_losses[-1] < train_losses[0], train_losses
    # checkpoints + csv written
    assert len(list((tmp_path / "tiny").glob("*.tar"))) == 3
    assert (tmp_path / "tiny" / "logged_metrics.csv").exists()
    # admm params stayed in the clamp range
    leaves = jax.tree_util.tree_flatten_with_path(trainer.params)[0]
    for path, leaf in leaves:
        name = str(path[-1])
        if "lmbda" in name or "rho" in name:
            assert float(np.min(np.asarray(leaf))) >= 1e-12
            assert float(np.max(np.asarray(leaf))) <= 5.0


def test_trainer_full_state_resume(tmp_path):
    """Beyond-reference: resume restores params, optimizer state AND epoch."""
    model = M.Conv2d(3, 3, 1)
    loss = MSE("cpu")

    def make_trainer():
        saver = NNSaver(str(tmp_path), "resume_m", SaveMode.Each, use_time_date=False)
        return NNTrainer(loss, [], saver, MetricsLogger(loss, []))

    loader = _SyntheticLoader(n_batches=2)
    t1 = make_trainer()
    t1.run(model, make_optimizer(1e-2), epochs=2, train_dataloader=loader,
           eval_dataloader=loader, base_lr=1e-2)
    ckpts = sorted((tmp_path / "resume_m").glob("*.tar"))
    assert len(ckpts) == 2

    t2 = make_trainer()
    t2.run(model, make_optimizer(1e-2), epochs=4, train_dataloader=loader,
           eval_dataloader=loader, base_lr=1e-2, resume_ckpt=str(ckpts[-1]))
    # resumed from epoch 2 => only epochs 2,3 trained => 2 new checkpoints
    new_ckpts = sorted((tmp_path / "resume_m").glob("*.tar"))
    assert {p.name.split("_vloss")[0] for p in new_ckpts} == {
        "resume_m_epoch00", "resume_m_epoch01", "resume_m_epoch02", "resume_m_epoch03",
    }
    # params actually restored (not re-initialized): epoch-2 loss continues
    # below the fresh-init epoch-0 loss
    l0 = MetricsLogger(loss, [])  # noqa: F841 (structure check only)
    assert t2.logger.metrics["train"][loss.m_name][0] <= \
        t1.logger.metrics["train"][loss.m_name][0]


def test_trainer_scheduler_steps_per_eval_batch(tmp_path):
    """Reference quirk: lr scheduler advances once per EVAL batch."""
    model = M.Conv2d(3, 3, 1)
    loss = MSE("cpu")
    trainer = NNTrainer(loss, [], None, MetricsLogger(loss, []))
    sched = cosine_annealing_warm_restarts(1e-3, 100)
    trainer.run(
        model, make_optimizer(1e-3), epochs=2,
        train_dataloader=_SyntheticLoader(n_batches=3),
        eval_dataloader=_SyntheticLoader(n_batches=2),
        lr_scheduler=sched, base_lr=1e-3,
    )
    assert trainer._sched_count == 4  # 2 epochs x 2 eval batches


def test_light_train_metrics_skips_monitoring_on_train(tmp_path):
    """light_train_metrics: train steps accumulate only loss+MSE (PSNR still
    derives from mean MSE per the reference logger contract); eval keeps the
    full metric set. Heavy metric columns are NaN on train, finite on eval."""
    model = M.Conv2d(3, 3, 1)
    loss = MSE("cpu")
    metrics = [PSNRMetric("cpu"), SSIMLoss("cpu"), MSE("cpu")]
    logger = MetricsLogger(loss, metrics)
    trainer = NNTrainer(loss, metrics, None, logger, light_train_metrics=True)
    loader = _SyntheticLoader(n_batches=2)
    trainer.run(model, make_optimizer(1e-2), epochs=1, train_dataloader=loader,
                eval_dataloader=loader, base_lr=1e-2)
    train = trainer.get_epoch_metrics("train")
    evalm = trainer.get_epoch_metrics("eval")
    # loss + mse + psnr-from-mean-mse present and finite on train
    assert math.isfinite(train["mse"]) and math.isfinite(train["psnr"])
    # the conv-windowed monitoring metric was skipped on train...
    assert math.isnan(train["ssim_loss"])
    # ...but fully computed on eval
    assert math.isfinite(evalm["ssim_loss"])


# -- gradient accumulation (round-5: the reference's effective batch 3) ------


def _lin_setup():
    import flax.linen as nn

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = self.param("w", lambda k, s: jnp.ones(s, jnp.float32), (1,))
            return x * w

    model = Lin()
    x0 = jnp.ones((1, 1, 4, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)
    return model, params


def test_accum_matches_large_batch():
    """One accum-3 update over three batch-1 micro-batches must equal one
    batch-3 update: the mean-loss gradient decomposes exactly (the point of
    restoring the reference's configs/train_cfg.json:8 batch 3 on a chip
    that only fits batch 1)."""
    from torch_admm_deconv_tpu.metrics.losses import MSE
    from torch_admm_deconv_tpu.train.trainer import NNTrainer, make_optimizer

    model, params = _lin_setup()
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((3, 1, 1, 4, 4)), jnp.float32)
    ys = jnp.asarray(rng.random((3, 1, 1, 4, 4)), jnp.float32)
    tx = make_optimizer(1e-2)

    acc_tr = NNTrainer(MSE(None), [], saver=None, clamp_admm_params=False,
                       accum_steps=3)
    step3, _ = acc_tr._build_steps(model, tx)
    p3, _, _, _ = step3(params, tx.init(params), xs, ys, 1e-2,
                        acc_tr._fresh_acc("train"))

    big_tr = NNTrainer(MSE(None), [], saver=None, clamp_admm_params=False)
    step1, _ = big_tr._build_steps(model, tx)
    xb = xs.reshape(3, 1, 4, 4)
    yb = ys.reshape(3, 1, 4, 4)
    pb, _, _, _ = step1(params, tx.init(params), xb, yb, 1e-2,
                        big_tr._fresh_acc("train"))

    np.testing.assert_allclose(
        np.asarray(p3["params"]["w"]), np.asarray(pb["params"]["w"]), rtol=1e-6
    )


def test_accum_nonfinite_micro_masked():
    """A non-finite micro-gradient is excluded from the average; the update
    equals the mean of the FINITE micro-grads, and an all-bad group applies
    no update at all."""
    from torch_admm_deconv_tpu.metrics.losses import MSE
    from torch_admm_deconv_tpu.train.trainer import NNTrainer, make_optimizer

    model, params = _lin_setup()
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.random((2, 1, 1, 4, 4)), jnp.float32)
    ys_good = jnp.asarray(rng.random((2, 1, 1, 4, 4)), jnp.float32)
    ys_bad = ys_good.at[1].set(jnp.nan)
    tx = make_optimizer(1e-2)

    tr = NNTrainer(MSE(None), [], saver=None, clamp_admm_params=False,
                   accum_steps=2)
    step, _ = tr._build_steps(model, tx)

    # group with one bad micro-batch == single-step update on the good one
    p_mask, _, _, acc = step(params, tx.init(params), xs, ys_bad, 1e-2,
                             tr._fresh_acc("train"))
    solo = NNTrainer(MSE(None), [], saver=None, clamp_admm_params=False)
    sstep, _ = solo._build_steps(model, tx)
    p_solo, _, _, _ = sstep(params, tx.init(params), xs[0], ys_good[0], 1e-2,
                            solo._fresh_acc("train"))
    np.testing.assert_allclose(
        np.asarray(p_mask["params"]["w"]), np.asarray(p_solo["params"]["w"]),
        rtol=1e-6,
    )
    assert int(jax.device_get(acc)["nonfinite_steps"]) == 1

    # all-bad group: params bit-identical (no update)
    ys_allbad = jnp.full_like(ys_good, jnp.nan)
    p_none, _, _, _ = step(params, tx.init(params), xs, ys_allbad, 1e-2,
                           tr._fresh_acc("train"))
    np.testing.assert_array_equal(
        np.asarray(p_none["params"]["w"]), np.asarray(params["params"]["w"])
    )


def test_accum_epoch_loop_groups_and_drops(tmp_path):
    """run() groups accum_steps loader batches per update and drops the
    trailing partial group; the epoch still trains and logs."""
    model = M.Conv2d(3, 3, 1)
    loss = MSE("cpu")
    logger = MetricsLogger(loss, [])
    saver = NNSaver(str(tmp_path), "accum_m", SaveMode.Each, use_time_date=False)
    trainer = NNTrainer(loss, [], saver, logger, accum_steps=2)
    loader = _SyntheticLoader(n_batches=5)  # 2 updates + 1 dropped
    trainer.run(model, make_optimizer(3e-3), epochs=2,
                train_dataloader=loader, eval_dataloader=_SyntheticLoader(n_batches=2, seed=1),
                base_lr=3e-3)
    train_losses = logger.metrics["train"][loss.m_name]
    assert len(train_losses) == 2
    assert train_losses[-1] < train_losses[0], train_losses
