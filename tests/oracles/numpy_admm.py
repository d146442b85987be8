"""Independent NumPy oracle of the reference TV-ADMM update equations.

Written directly from the math of ``fft_admm_tv``
(/root/reference/src/admmtor/eops/deconv.py:35-117) as a correctness oracle
for the JAX solver — deliberately using different primitives (roll-based
shifts, float64) than both the reference (torch convs) and the implementation
under test (jnp rolls + closed-form OTFs), so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np


def soft_thresh(x, tau):
    return np.sign(x) * np.maximum(np.abs(x) - tau, 0.0)


def block_thresh(x, tau):
    norm = np.sqrt(np.sum(x * x, axis=(0, 1)) + 1e-15)
    return np.maximum(1.0 - tau / (norm + 1e-15), 0.0) * x


def dx(a):
    return a - np.roll(a, 1, axis=-1)


def dy(a):
    return a - np.roll(a, 1, axis=-2)


def dx_t(a):
    return a - np.roll(a, -1, axis=-1)


def dy_t(a):
    return a - np.roll(a, -1, axis=-2)


def htran(x, kern):
    """H^T as circular correlation with the flipped PSF, half-pad centered.

    out[i, j] = sum_{a,b} kflip[a, b] * x[(i + a - top) % H, (j + b - left) % W]
    with top = floor((kh-1)/2), left = floor((kw-1)/2).
    """
    if kern is None or kern.size == 0:
        return x
    k = np.asarray(kern).reshape(kern.shape[-2], kern.shape[-1])
    kflip = k[::-1, ::-1]
    kh, kw = kflip.shape
    top, left = (kh - 1) // 2, (kw - 1) // 2
    out = np.zeros_like(x)
    for a in range(kh):
        for b in range(kw):
            out += kflip[a, b] * np.roll(x, (top - a, left - b), axis=(-2, -1))
    return out


def freq_denominator(shape, rho, kern):
    h, w = shape
    dxk = np.zeros((h, w))
    dxk[1, 0], dxk[1, 1] = -1.0, 1.0  # [[0,0],[-1,1]] placed top-left
    dyk = np.zeros((h, w))
    dyk[0, 1], dyk[1, 1] = -1.0, 1.0  # [[0,-1],[0,1]]
    d2 = np.abs(np.fft.rfft2(dxk)) ** 2 + np.abs(np.fft.rfft2(dyk)) ** 2
    if kern is None or kern.size == 0:
        h2 = np.ones(())
    else:
        k = np.asarray(kern).reshape(kern.shape[-2], kern.shape[-1])
        kp = np.zeros((h, w))
        kp[: k.shape[0], : k.shape[1]] = k
        h2 = np.abs(np.fft.rfft2(kp)) ** 2
    return 1.0 / (h2 + rho * d2)


def fft_admm_tv(xin, lmbd, rho, kern=None, iso=False, maxit=100):
    """Reference update equations in float64 NumPy."""
    xin = np.asarray(xin, np.float64)
    if xin.ndim == 2:
        xin = xin[None, None]
    elif xin.ndim == 3:
        xin = xin[None]
    _, _, h, w = xin.shape
    tau = lmbd / rho
    freq_c = freq_denominator((h, w), rho, kern)
    thresh = block_thresh if iso else soft_thresh

    hty = htran(xin, kern)
    x = np.zeros_like(xin)
    z_x = np.zeros_like(xin)
    z_y = np.zeros_like(xin)
    u_x = np.zeros_like(xin)
    u_y = np.zeros_like(xin)

    for _ in range(maxit):
        rhs = hty + rho * (dx_t(z_x - u_x) + dy_t(z_y - u_y))
        x = np.fft.irfft2(freq_c * np.fft.rfft2(rhs, axes=(-2, -1)), s=(h, w), axes=(-2, -1))
        dxk = dx(x)
        dyk = dy(x)
        z_x = thresh(dxk + u_x, tau)
        z_y = thresh(dyk + u_y, tau)
        u_x = u_x + dxk - z_x
        u_y = u_y + dyk - z_y
    return x


def gaussian_psf(size: int, sigma: float) -> np.ndarray:
    """Separable Gaussian PSF (1, 1, size, size), normalized to sum 1."""
    ax = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2.0 * sigma**2))
    k = np.outer(g, g)
    k /= k.sum()
    return k[None, None]
