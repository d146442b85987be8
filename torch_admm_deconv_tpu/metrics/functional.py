"""Image quality metrics in JAX: MSE, MAE, PSNR, SSIM, MS-SSIM, UIQ, SCC.

JAX-native replacements for the reference's torchmetrics wrappers
(/root/reference/src/admmtor/emetrics/metrics.py:26-135), with the same
conventions: SSIM uses a gaussian window (kernel 11, sigma 1.5 by default;
the training loss uses kernel 7, metrics.py:40-44) over valid windows; PSNR
reduces the MSE over the whole batch; UIQ is the Wang-Bovik index with a
gaussian window; SCC high-pass filters with the 3x3 laplacian then
window-correlates. All functions take NCHW float arrays in [0, data_range].
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# TPU matmuls/convs run at bf16 ("default") precision unless told otherwise.
# Every windowed moment below computes a variance as E[x^2] - mu^2 — a
# catastrophic cancellation at bf16 (~3 decimal digits on values ~1): on the
# chip var_x + var_y can land near -c2, blowing SSIM to O(10) and the
# round-2 flagship training loss to -30 before the first optimizer step NaNed
# the weights (train_run.log; diagnosed round 3, scripts/diag_tpu.py). The
# windows are tiny, so full-f32 convs cost nothing measurable.
_CONV_PRECISION = jax.lax.Precision.HIGHEST


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    return 10.0 * jnp.log10(data_range**2 / mse(pred, target))


def _gaussian_kernel1d(size: int, sigma: float, dtype) -> jnp.ndarray:
    ax = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-(ax**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _windowed_means(x: jnp.ndarray, kernel1d: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-window weighted mean over the last two axes of NCHW."""
    k = kernel1d
    x = jax.lax.conv_general_dilated(
        x,
        jnp.broadcast_to(k[None, None, :, None], (x.shape[1], 1, k.shape[0], 1)),
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=x.shape[1],
        precision=_CONV_PRECISION,
    )
    x = jax.lax.conv_general_dilated(
        x,
        jnp.broadcast_to(k[None, None, None, :], (x.shape[1], 1, 1, k.shape[0])),
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=x.shape[1],
        precision=_CONV_PRECISION,
    )
    return x


def _uniform_kernel1d(size: int, dtype) -> jnp.ndarray:
    return jnp.full((size,), 1.0 / size, dtype)


def _ssim_map(
    pred, target, kernel1d, data_range: float, k1: float = 0.01, k2: float = 0.03
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _windowed_means(pred, kernel1d)
    mu_y = _windowed_means(target, kernel1d)
    mu_xx = _windowed_means(pred * pred, kernel1d)
    mu_yy = _windowed_means(target * target, kernel1d)
    mu_xy = _windowed_means(pred * target, kernel1d)
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    cs = (2.0 * cov + c2) / (var_x + var_y + c2)
    ssim = ((2.0 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)) * cs
    return ssim, cs


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    k = _gaussian_kernel1d(kernel_size, sigma, pred.dtype)
    m, _ = _ssim_map(pred, target, k, data_range)
    return jnp.mean(m)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. 2003), 5 scales with the standard
    weights; 2x average-pool downsampling between scales."""
    k = _gaussian_kernel1d(kernel_size, sigma, pred.dtype)
    vals = []
    p, t = pred, target
    n_scales = len(_MSSSIM_WEIGHTS)
    for i in range(n_scales):
        m, cs = _ssim_map(p, t, k, data_range)
        vals.append(jnp.mean(m) if i == n_scales - 1 else jnp.mean(cs))
        if i < n_scales - 1:
            p = jax.lax.reduce_window(p, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4.0
            t = jax.lax.reduce_window(t, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4.0
    total = jnp.ones((), pred.dtype)
    for v, w in zip(vals, _MSSSIM_WEIGHTS):
        total = total * jax.nn.relu(v) ** w
    return total


def uiq(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Universal Image Quality index (Wang & Bovik 2002), gaussian-windowed
    like torchmetrics' default."""
    k = _gaussian_kernel1d(kernel_size, sigma, pred.dtype)
    mu_x = _windowed_means(pred, k)
    mu_y = _windowed_means(target, k)
    var_x = _windowed_means(pred * pred, k) - mu_x * mu_x
    var_y = _windowed_means(target * target, k) - mu_y * mu_y
    cov = _windowed_means(pred * target, k) - mu_x * mu_y
    num = 4.0 * cov * mu_x * mu_y
    den = (var_x + var_y) * (mu_x * mu_x + mu_y * mu_y)
    eps = jnp.finfo(pred.dtype).eps
    return jnp.mean(num / (den + eps))


_LAPLACIAN = jnp.asarray([[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]])


def scc(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 8,
) -> jnp.ndarray:
    """Spatial Correlation Coefficient: laplacian high-pass both images,
    then windowed Pearson correlation, averaged."""
    hp = jnp.broadcast_to(
        _LAPLACIAN.astype(pred.dtype)[None, None], (pred.shape[1], 1, 3, 3)
    )

    def filt(x):
        return jax.lax.conv_general_dilated(
            x,
            hp,
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=x.shape[1],
            precision=_CONV_PRECISION,
        )

    fx = filt(pred)
    fy = filt(target)
    k = _uniform_kernel1d(window_size, pred.dtype)
    mu_x = _windowed_means(fx, k)
    mu_y = _windowed_means(fy, k)
    var_x = _windowed_means(fx * fx, k) - mu_x * mu_x
    var_y = _windowed_means(fy * fy, k) - mu_y * mu_y
    cov = _windowed_means(fx * fy, k) - mu_x * mu_y
    eps = jnp.finfo(pred.dtype).eps
    corr = cov / jnp.sqrt(jnp.maximum(var_x * var_y, 0.0) + eps)
    return jnp.mean(corr)
