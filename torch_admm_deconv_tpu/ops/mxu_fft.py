"""rfft2 / irfft2 as MXU matmuls — the fast path for the x-update.

Profiling on TPU v5e shows XLA's native FFT runs the solver's 512x512
batched transforms at ~7% of the HBM roofline (~2 ms/iteration for batch
8x3, vs ~0.17 ms for ALL the elementwise work). A dense DFT costs O(N) more
FLOPs than an FFT, but those FLOPs land on the MXU systolic array where the
chip has two orders of magnitude more throughput than wherever XLA's FFT
lowering runs — so for image-sized transforms the matmul DFT wins by a wide
margin and becomes bandwidth-bound.

Formulation (separable, real-optimized):
  forward:  W-stage  X = x @ (Cw - i Sw)         2 real matmuls
            H-stage  Y = F_h X (complex x complex) 4 real matmuls
  inverse:  H-stage  Z = F_h^H Y / h               4 real matmuls
            W-stage  x = Zr @ Cw' - Zi @ Sw'       2 real matmuls
where Cw'/Sw' carry the hermitian-completion weights (alpha_0 = alpha_{w/2}
= 1, else 2, over w). All matmuls run in f32 with
``preferred_element_type=float32`` (DFT-by-matmul error ~ sqrt(N) * eps —
same order as the f32 FFT). Everything is differentiable (plain matmuls),
so the unrolled training path uses it too.

The matrices are shape-dependent constants ((w, wf) + (h, h) pairs, ~3 MB
at 512^2) built once per jit trace.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _dft_mats_np(h: int, w: int):
    wf = w // 2 + 1
    n_w = np.arange(w)
    k_w = np.arange(wf)
    ang_w = 2.0 * np.pi * np.outer(n_w, k_w) / w  # (w, wf)
    cw = np.cos(ang_w)
    sw = np.sin(ang_w)

    n_h = np.arange(h)
    ang_h = 2.0 * np.pi * np.outer(n_h, n_h) / h  # (h, h)
    ch = np.cos(ang_h)
    sh = np.sin(ang_h)

    alpha = np.full(wf, 2.0)
    alpha[0] = 1.0
    if w % 2 == 0:
        alpha[-1] = 1.0
    # inverse W-stage: x[n] = sum_k alpha_k (Zr cos - Zi sin)(k, n) / w
    icw = (alpha[:, None] * np.cos(2.0 * np.pi * np.outer(k_w, n_w) / w)) / w  # (wf, w)
    isw = (alpha[:, None] * np.sin(2.0 * np.pi * np.outer(k_w, n_w) / w)) / w
    f32 = np.float32
    return (cw.astype(f32), sw.astype(f32), ch.astype(f32), sh.astype(f32),
            icw.astype(f32), isw.astype(f32))


def dft_mats(h: int, w: int):
    return tuple(jnp.asarray(m) for m in _dft_mats_np(h, w))


def _mm(a, b):
    # HIGHEST: TPU f32 matmuls otherwise run as bf16 passes — the DFT's
    # roundoff then amplifies through the solver's shrinkage nonlinearity
    return jnp.matmul(
        a, b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH
    )


def _hstage(v, mat):
    """Contract axis -2 against a (h, h) DFT matrix."""
    return jnp.swapaxes(_mm(jnp.swapaxes(v, -2, -1), mat), -2, -1)


# -- 1-D stages (also the building blocks of the pencil-decomposed
#    distributed FFT in parallel/spatial.py) --------------------------------


def rfft_w_stage(x, cw, sw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., W) real -> (Xr, Xi) each (..., Wf): X = x @ (Cw - i Sw)."""
    return _mm(x, cw), -_mm(x, sw)


def fft_h_stage(xr, xi, ch, sh) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Complex DFT along axis -2 as 4 real matmuls:
    Y[k] = sum_n e^{-i ang_h[n,k]} X[n]."""
    return _hstage(xr, ch) + _hstage(xi, sh), _hstage(xi, ch) - _hstage(xr, sh)


def ifft_h_stage(yr, yi, ch, sh, h: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse complex DFT along axis -2: Z = F_h^H Y / h (matrices are
    symmetric in (n, k))."""
    return (_hstage(yr, ch) - _hstage(yi, sh)) / h, (_hstage(yi, ch) + _hstage(yr, sh)) / h


def irfft_w_stage(zr, zi, icw, isw) -> jnp.ndarray:
    """(..., Wf) complex pair -> (..., W) real; icw/isw carry the
    hermitian-completion weights and the 1/w scale."""
    return _mm(zr, icw) - _mm(zi, isw)


def rfft2_mxu(x: jnp.ndarray, mats=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., H, W) real -> (Yr, Yi) each (..., H, Wf)."""
    h, w = x.shape[-2], x.shape[-1]
    cw, sw, ch, sh, _, _ = mats if mats is not None else dft_mats(h, w)
    xr, xi = rfft_w_stage(x, cw, sw)
    return fft_h_stage(xr, xi, ch, sh)


def irfft2_mxu(yr: jnp.ndarray, yi: jnp.ndarray, mats=None, shape=None) -> jnp.ndarray:
    """(Yr, Yi) (..., H, Wf) -> (..., H, W) real."""
    h = yr.shape[-2]
    if mats is None:
        assert shape is not None
        mats = dft_mats(*shape)
    cw, sw, ch, sh, icw, isw = mats
    zr, zi = ifft_h_stage(yr, yi, ch, sh, h)
    return irfft_w_stage(zr, zi, icw, isw)


def freq_solve_mxu(s: jnp.ndarray, freq_c: jnp.ndarray, mats=None) -> jnp.ndarray:
    """irfft2(freq_c * rfft2(s)) via MXU matmuls. ``freq_c`` is real
    (H, Wf) (broadcast over leading dims)."""
    h, w = s.shape[-2], s.shape[-1]
    mats = mats if mats is not None else dft_mats(h, w)
    yr, yi = rfft2_mxu(s, mats)
    return irfft2_mxu(freq_c * yr, freq_c * yi, mats)


# ---------------------------------------------------------------------------
# Hartley fast path: 4 real matmuls instead of 12
# ---------------------------------------------------------------------------
#
# The x-update kernel's spectrum freq_c = 1/(|H_hat|^2 + rho |D_hat|^2) is
# EVEN PER AXIS whenever |H_hat|^2 is (always in empty-kernel denoising mode
# — the mode all trained reference models use — and for symmetric PSFs).
# A circulant operator whose eigenvalues satisfy F(ky,kx) = F(-ky,kx) =
# F(ky,-kx) is diagonalized by the separable cas basis (cas = cos + sin):
# every cas_h x cas_w tensor vector combines the four exponentials
# (+-ky, +-kx), which all share one eigenvalue. So
#   x = (T_h/h) [ Lambda . (T_h s T_w^T) ] (T_w/w)^T
# with T_N[k, n] = cas(2 pi k n / N) — two real matmuls per direction,
# no complex arithmetic, ~1.5x fewer MXU FLOPs than the rDFT form.


@lru_cache(maxsize=32)
def _cas_mats_np(h: int, w: int):
    n_h = np.arange(h)
    ang_h = 2.0 * np.pi * np.outer(n_h, n_h) / h
    th = (np.cos(ang_h) + np.sin(ang_h)).astype(np.float32)  # symmetric
    n_w = np.arange(w)
    ang_w = 2.0 * np.pi * np.outer(n_w, n_w) / w
    tw = (np.cos(ang_w) + np.sin(ang_w)).astype(np.float32)
    return th, tw


def cas_mats(h: int, w: int):
    th, tw = _cas_mats_np(h, w)
    return jnp.asarray(th), jnp.asarray(tw)


def mirror_freq_full(freq_c: jnp.ndarray, w: int) -> jnp.ndarray:
    """(H, Wf) rfft-grid spectrum -> full (H, W) grid by hermitian mirror
    (valid because the spectrum is real and per-axis even)."""
    body = freq_c[:, 1 : (w + 1) // 2]
    return jnp.concatenate([freq_c[:, : w // 2 + 1], body[:, ::-1]], axis=-1)


def mirror_freq_full_joint(freq_c: jnp.ndarray, w: int) -> jnp.ndarray:
    """(H, Wf) rfft-grid spectrum -> full (H, W) grid by the CONJUGATE
    mirror full[k1, W-k2] = half[(H-k1) % H, k2]. Valid for any real
    spectrum of a real operator (|H_hat|^2, freq_c with arbitrary PSF) —
    jointly even under k -> -k but not necessarily even per axis. For
    per-axis-even spectra it coincides with :func:`mirror_freq_full`."""
    body = freq_c[:, 1 : (w + 1) // 2]
    mirrored = jnp.roll(body[::-1, ::-1], 1, axis=0)
    return jnp.concatenate([freq_c[:, : w // 2 + 1], mirrored], axis=-1)


# -- Hartley-pair (general real PSF) path -----------------------------------
#
# The separable cas-cas transform above diagonalizes per-axis-even spectra
# only. For an ARBITRARY real PSF the x-update spectrum freq_c is still real
# and JOINTLY even (freq_c(-k) = freq_c(k), from hermitian symmetry of the
# OTF), and the TRUE 2-D Hartley transform diagonalizes every such operator:
#   y = DHT2( freq . DHT2(s) ) / (H*W).
# DHT2 factors into FOUR matmuls using the cas pair (cas(a+b) expansion):
#   DHT2(v) = (T_h v) C_w + (T_h' v) S_w
# with T_h' [k] = T_h[(H-k) % H] (a row permutation, precomputed) and
# C_w/S_w the plain cos/sin matrices — 8 matmuls per x-update instead of the
# symmetric path's 4, still all on the MXU. Verified against
# irfft2(freq * rfft2(s)) in tests/test_mxu_fft.py.


@lru_cache(maxsize=32)
def _cas_pair_mats_np(h: int, w: int):
    th, _ = _cas_mats_np(h, w)
    thp = np.roll(th[::-1], 1, axis=0)  # thp[k] = th[(h - k) % h]
    n_w = np.arange(w)
    ang_w = 2.0 * np.pi * np.outer(n_w, n_w) / w
    cw = np.cos(ang_w).astype(np.float32)
    sw = np.sin(ang_w).astype(np.float32)
    return thp.astype(np.float32), cw, sw


def cas_pair_mats(h: int, w: int):
    """(T_h, T_h', C_w, S_w) for the general-PSF Hartley-pair transform."""
    th, _ = _cas_mats_np(h, w)
    thp, cw, sw = _cas_pair_mats_np(h, w)
    return jnp.asarray(th), jnp.asarray(thp), jnp.asarray(cw), jnp.asarray(sw)


def freq_solve_dht_general(s: jnp.ndarray, freq_full: jnp.ndarray, mats=None) -> jnp.ndarray:
    """x-update via the true 2-D Hartley transform — valid for ANY real PSF.
    ``freq_full`` is the full (H, W) jointly-even spectrum
    (:func:`mirror_freq_full_joint`)."""
    h, w = s.shape[-2], s.shape[-1]
    th, thp, cw, sw = mats if mats is not None else cas_pair_mats(h, w)

    def lstage(v, mat):
        return jnp.swapaxes(_mm(jnp.swapaxes(v, -2, -1), mat), -2, -1)

    def dht2(v):
        return _mm(lstage(v, th), cw) + _mm(lstage(v, thp), sw)

    return dht2(freq_full * dht2(s)) / (h * w)


def freq_solve_dht(s: jnp.ndarray, freq_full: jnp.ndarray, mats=None) -> jnp.ndarray:
    """x-update via the separable Hartley transform. ``freq_full`` is the
    full (H, W) per-axis-even spectrum (see :func:`mirror_freq_full`).
    Requires a per-axis-even spectrum — callers must gate on that."""
    h, w = s.shape[-2], s.shape[-1]
    th, tw = mats if mats is not None else cas_mats(h, w)

    def hstage(v, mat):
        return jnp.swapaxes(_mm(jnp.swapaxes(v, -2, -1), mat), -2, -1)

    y = _mm(hstage(s, th), tw)  # T_h s T_w^T (T symmetric)
    y = y * freq_full
    return _mm(hstage(y, th), tw) / (h * w)


def psf_is_axis_symmetric(kern) -> bool:
    """True when the PSF gives a per-axis-even |OTF|^2: even per axis up to
    circular shift. Checked for the common case kern[i,j]==kern[-i,-j] per
    axis (e.g. gaussian); conservative False otherwise."""
    if kern is None or kern.size == 0:
        return True
    k = np.asarray(kern).reshape(kern.shape[-2], kern.shape[-1])
    return bool(
        np.allclose(k, k[::-1, :], atol=1e-7) and np.allclose(k, k[:, ::-1], atol=1e-7)
    )
