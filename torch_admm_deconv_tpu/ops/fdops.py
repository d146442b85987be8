"""Periodic finite-difference and blur operators for TV-ADMM.

The reference realizes D / D^T / H^T as grouped circular 2D convolutions with
2x2 difference kernels (``/root/reference/src/admmtor/eops/deconv.py:31-101``).
On TPU that is the wrong primitive: a 2x2 grouped conv per channel is tiny,
MXU-hostile work. The circulant difference operators are exactly one-pixel
circular shifts, so we express them as ``jnp.roll`` subtractions — pure VPU
elementwise work that XLA fuses into neighbouring ops, and that maps onto
``pltpu.roll`` inside the fused Pallas iteration kernel.

Operator identities (derived from the reference's conv kernels + pads):
  Dx  x = x - roll(x, +1, axis=-1)   (backward diff along W, circular)
  Dy  x = x - roll(x, +1, axis=-2)   (backward diff along H, circular)
  Dx^T a = a - roll(a, -1, axis=-1)
  Dy^T a = a - roll(a, -1, axis=-2)
matching deconv.py:51-52 (kernels [[0,0],[-1,1]], [[0,-1],[0,1]]) with pads
(1,0,1,0) and the flipped kernels with pads (0,1,0,1) at deconv.py:69-84.

Frequency-domain precomputes follow deconv.py:49-57: the PSF OTF is the
unshifted zero-padded rfft2 and the denominator uses |.|^2 magnitudes only,
which are shift-invariant, so placement does not matter for parity.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def dx(x: jnp.ndarray) -> jnp.ndarray:
    """Backward difference along the last (W) axis with circular wrap."""
    return x - jnp.roll(x, 1, axis=-1)


def dy(x: jnp.ndarray) -> jnp.ndarray:
    """Backward difference along the second-to-last (H) axis, circular."""
    return x - jnp.roll(x, 1, axis=-2)


def dx_t(a: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of :func:`dx` under the periodic inner product."""
    return a - jnp.roll(a, -1, axis=-1)


def dy_t(a: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of :func:`dy`."""
    return a - jnp.roll(a, -1, axis=-2)


def conv_circular(x: jnp.ndarray, w: jnp.ndarray, pads: Tuple[int, int, int, int]) -> jnp.ndarray:
    """Grouped circular cross-correlation, NCHW input, (O,1,kh,kw) kernel.

    General-purpose equivalent of the reference's ``conv_circular``
    (deconv.py:31-32): circular-pad then valid cross-correlation, one filter
    per channel (depthwise). ``pads`` is (left, right, top, bottom).
    Used only for PSF-sized kernels (H^T); the difference operators use the
    roll forms above.
    """
    left, right, top, bottom = pads
    xp = jnp.pad(
        x,
        ((0, 0), (0, 0), (top, bottom), (left, right)),
        mode="wrap",
    )
    w = w.astype(x.dtype)
    c = x.shape[1]
    return jax.lax.conv_general_dilated(
        xp,
        jnp.tile(w, (c, 1, 1, 1)) if w.shape[0] == 1 else w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def psf_otf(kern: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """rfft2 of the PSF zero-padded (top-left, unshifted) to ``shape``.

    Matches ``torch.fft.rfftn(kern, s=(H, W), dim=(2, 3))`` at deconv.py:49.
    ``kern`` is (1, 1, kh, kw) (or any (..., kh, kw)); returns complex with
    trailing dims (H, W//2+1).
    """
    h, w = shape
    kh, kw = kern.shape[-2], kern.shape[-1]
    padded = jnp.pad(
        kern,
        [(0, 0)] * (kern.ndim - 2) + [(0, h - kh), (0, w - kw)],
    )
    return jnp.fft.rfft2(padded, axes=(-2, -1))


def grad_otf_abs2(shape: Tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """|Dx_hat|^2 + |Dy_hat|^2 on the rfft2 grid, closed form.

    The reference materializes the 2x2 difference kernels, zero-pads and
    rffts them (deconv.py:51-57). The transfer function of a one-pixel
    backward difference is (1 - e^{-i w}), whose squared magnitude is
    2 - 2 cos(w) = 4 sin^2(w/2) — so we evaluate it directly instead of
    running two FFTs. Returns shape (H, W//2+1) real.
    """
    h, w = shape
    wy = 2.0 * jnp.pi * jnp.arange(h, dtype=dtype) / h
    wx = 2.0 * jnp.pi * jnp.arange(w // 2 + 1, dtype=dtype) / w
    sy2 = 4.0 * jnp.sin(wy / 2.0) ** 2
    sx2 = 4.0 * jnp.sin(wx / 2.0) ** 2
    return sy2[:, None] + sx2[None, :]


def freq_denominator(
    shape: Tuple[int, int],
    rho,
    kern: jnp.ndarray | None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """freq_c = 1 / (|H_hat|^2 + rho * (|Dx_hat|^2 + |Dy_hat|^2)).

    Matches deconv.py:46-57 including the empty-kernel mode where
    |H_hat|^2 == 1 (pure TV denoising). Returns (H, W//2+1) real.
    """
    d2 = grad_otf_abs2(shape, dtype)
    if kern is None or kern.size == 0:
        h_abs2 = jnp.ones((), dtype)
    else:
        otf = psf_otf(kern.astype(dtype), shape)
        h_abs2 = (otf.real * otf.real + otf.imag * otf.imag).reshape(shape[0], shape[1] // 2 + 1)
    return 1.0 / (h_abs2 + rho * d2)


def _htran_pads(kh: int, kw: int) -> Tuple[int, int, int, int]:
    """(left, right, top, bottom) circular pads for the H^T correlation.

    The reference computes ceil/floor half-pads and applies them via its
    ``pad2`` tuple (deconv.py:90-99). For the square PSFs it supports this is
    left = floor((k-1)/2), right = ceil((k-1)/2) and likewise vertically;
    we use the per-axis-correct form so non-square PSFs also work (the
    reference's pad tuple transposes axes for kh != kw and would produce
    mis-shaped outputs — see SURVEY.md known defects).
    """
    top, bottom = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
    left, right = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
    return (left, right, top, bottom)


def psf_otf_centered(kern: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """OTF of the PSF centered per the reference's half-pad convention.

    The reference's H^T is a spatial circular correlation with the flipped
    PSF and asymmetric half-pads (deconv.py:89-101), i.e. H is circular
    convolution with the kernel centered at (floor((kh-1)/2),
    floor((kw-1)/2)). Its transfer function is the rfft2 of the kernel
    zero-padded top-left and circularly rolled by (-top, -left). H^T is then
    multiplication by the conjugate — see :func:`htran_fft`.

    This is the TPU-native H^T: depthwise spatial convs are MXU-hostile and
    (on this toolchain) pathologically slow to compile; the FFT form costs
    one extra transform pair in the loop-invariant precompute and nothing per
    iteration.
    """
    h, w = shape
    kh, kw = kern.shape[-2], kern.shape[-1]
    top, left = (kh - 1) // 2, (kw - 1) // 2
    padded = jnp.pad(
        kern,
        [(0, 0)] * (kern.ndim - 2) + [(0, h - kh), (0, w - kw)],
    )
    centered = jnp.roll(padded, (-top, -left), axis=(-2, -1))
    return jnp.fft.rfft2(centered, axes=(-2, -1))


def htran_fft(x: jnp.ndarray, otf_c: jnp.ndarray, im_shape: Tuple[int, int]) -> jnp.ndarray:
    """H^T x = irfft2(conj(OTF) * rfft2(x)) with the centered OTF."""
    return jnp.fft.irfft2(
        jnp.conj(otf_c) * jnp.fft.rfft2(x, axes=(-2, -1)), s=im_shape, axes=(-2, -1)
    )


def htran_operator(kern: jnp.ndarray | None):
    """Return H^T as a callable on NCHW batches.

    Empty/None kernel => identity (pure denoising mode, deconv.py:86-87).
    Otherwise a depthwise circular correlation with the flipped PSF and the
    asymmetric half-pads of deconv.py:89-101.
    """
    if kern is None or kern.size == 0:
        return lambda x: x
    kh, kw = int(kern.shape[-2]), int(kern.shape[-1])
    flipped = jnp.flip(kern.reshape(1, 1, kh, kw), axis=(-2, -1))
    pads = _htran_pads(kh, kw)
    return partial(conv_circular, w=flipped, pads=pads)
