"""Metric/loss classes mirroring the reference's Metric ABC surface.

Capability parity with /root/reference/src/admmtor/emetrics/metrics.py:
each class carries ``m_name`` and is called as ``metric(y_pred, y_true)``.
The ``device`` constructor argument is accepted for API familiarity and
ignored (JAX arrays carry their own placement).
"""

from __future__ import annotations

import jax.numpy as jnp

from torch_admm_deconv_tpu.metrics import functional as F
from torch_admm_deconv_tpu.metrics.color import rgb_to_lab


class Metric:
    m_name: str = "metric"

    def __init__(self, device: str | None = None):
        self.device = device

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


class MSE(Metric):
    m_name = "mse"

    def __call__(self, y_pred, y_true):
        return F.mse(y_pred, y_true)


class MAELoss(Metric):
    m_name = "mae_loss"

    def __call__(self, y_pred, y_true):
        return F.mae(y_pred, y_true)


class SSIMLoss(Metric):
    """1 - SSIM with kernel 7 (metrics.py:37-44)."""

    m_name = "ssim_loss"

    def __init__(self, device=None, data_range: float = 1.0, kern_size: int = 7):
        super().__init__(device)
        self.data_range = data_range
        self.kern_size = kern_size

    def __call__(self, y_pred, y_true):
        return 1.0 - F.ssim(y_pred, y_true, self.data_range, self.kern_size)


class SSIMMetric(Metric):
    m_name = "ssim"

    def __init__(self, device=None, data_range: float = 1.0):
        super().__init__(device)
        self.data_range = data_range

    def __call__(self, y_pred, y_true):
        return F.ssim(y_pred, y_true, self.data_range)


class MSSSIMLoss(Metric):
    m_name = "mssssim_loss"  # reference typo kept for CSV-column parity

    def __init__(self, device=None, data_range: float = 1.0):
        super().__init__(device)
        self.data_range = data_range

    def __call__(self, y_pred, y_true):
        return 1.0 - F.ms_ssim(y_pred, y_true, self.data_range)


class MSSSIMMetric(Metric):
    m_name = "msssim"

    def __init__(self, device=None, data_range: float = 1.0):
        super().__init__(device)
        self.data_range = data_range

    def __call__(self, y_pred, y_true):
        return F.ms_ssim(y_pred, y_true, self.data_range)


class PSNRMetric(Metric):
    m_name = "psnr"

    def __init__(self, device=None, data_range: float = 1.0):
        super().__init__(device)
        self.data_range = data_range

    def __call__(self, y_pred, y_true):
        return F.psnr(y_pred, y_true, self.data_range)


class UIQMetric(Metric):
    m_name = "uiq"

    def __call__(self, y_pred, y_true):
        return F.uiq(y_pred, y_true)


class SCCMetric(Metric):
    m_name = "scc"

    def __call__(self, y_pred, y_true):
        return F.scc(y_pred, y_true)


class PSNRLoss(Metric):
    """10*log10 of per-image MSE, averaged (nafnet-style, metrics.py:138-166).
    ``to_y`` converts to the Y channel with the BT.601 coefficients first."""

    m_name = "psnr_loss"

    def __init__(self, device=None, to_y: bool = False):
        super().__init__(device)
        self.loss_weight = 1.0
        self.to_y = to_y
        self._coef = jnp.asarray([65.481, 128.553, 24.966]).reshape(1, 3, 1, 1)

    def __call__(self, y_pred, y_true):
        assert y_pred.ndim == 4
        pred, target = y_pred, y_true
        if self.to_y:
            pred = (pred * self._coef).sum(axis=1, keepdims=True) + 16.0
            target = (target * self._coef).sum(axis=1, keepdims=True) + 16.0
            pred, target = pred / 255.0, target / 255.0
        scale = 10.0 / jnp.log(10.0)
        per_image = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
        return self.loss_weight * scale * jnp.mean(jnp.log(per_image + 1e-8))


class SSIMLabColorLoss(Metric):
    """weighted (1 - SSIM) + L1 in CIELAB — the training loss
    (metrics.py:169-215, scripts/train.py:94). Weights 1.3 / 0.9 / 0.3."""

    m_name = "color_lab_loss"

    def __init__(
        self,
        device=None,
        ssim_weight: float = 1.3,
        color_weight_ab: float = 0.9,
        color_weight_l: float = 0.3,
    ):
        super().__init__(device)
        self.ssim_weight = ssim_weight
        self.color_weight_ab = color_weight_ab
        self.color_weight_l = color_weight_l
        self._ssim_loss = SSIMLoss(device)

    def __call__(self, y_pred, y_true):
        ssim_val = self._ssim_loss(y_pred, y_true)
        lab_pred = rgb_to_lab(y_pred)
        lab_true = rgb_to_lab(y_true)
        loss_l = jnp.mean(jnp.abs(lab_pred[:, 0] - lab_true[:, 0])) / 100.0
        loss_a = jnp.mean(jnp.abs(lab_pred[:, 1] - lab_true[:, 1])) / 200.0
        loss_b = jnp.mean(jnp.abs(lab_pred[:, 2] - lab_true[:, 2])) / 200.0
        color_ab = (loss_a + loss_b) / 2.0
        if self.color_weight_l <= 0:
            loss_l = 0.0
        return (
            self.ssim_weight * ssim_val
            + self.color_weight_ab * color_ab
            + self.color_weight_l * loss_l
        )
