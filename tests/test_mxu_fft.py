"""Matmul-DFT (MXU path) vs numpy FFT and the XLA solver path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_admm_deconv_tpu.ops.mxu_fft import (
    dft_mats,
    freq_solve_mxu,
    irfft2_mxu,
    rfft2_mxu,
)
from torch_admm_deconv_tpu.ops.solver import admm_tv


@pytest.mark.parametrize("h,w", [(16, 16), (32, 24), (17, 23), (8, 130)])
def test_rfft2_mxu_matches_numpy(rng, h, w):
    x = jnp.asarray(rng.normal(size=(2, 3, h, w)), jnp.float32)
    yr, yi = rfft2_mxu(x)
    want = np.fft.rfft2(np.asarray(x), axes=(-2, -1))
    scale = max(h, w)
    np.testing.assert_allclose(np.asarray(yr), want.real, atol=1e-3 * scale)
    np.testing.assert_allclose(np.asarray(yi), want.imag, atol=1e-3 * scale)


@pytest.mark.parametrize("h,w", [(16, 16), (32, 24), (17, 23)])
def test_roundtrip(rng, h, w):
    x = jnp.asarray(rng.normal(size=(1, 2, h, w)), jnp.float32)
    mats = dft_mats(h, w)
    yr, yi = rfft2_mxu(x, mats)
    back = irfft2_mxu(yr, yi, mats)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_freq_solve_matches_xla(rng):
    h = w = 32
    s = jnp.asarray(rng.normal(size=(2, 3, h, w)), jnp.float32)
    freq_c = jnp.asarray(rng.random((h, w // 2 + 1)), jnp.float32)
    want = jnp.fft.irfft2(freq_c * jnp.fft.rfft2(s, axes=(-2, -1)), s=(h, w), axes=(-2, -1))
    got = freq_solve_mxu(s, freq_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_solver_mxu_matches_xla(rng):
    from tests.oracles.numpy_admm import gaussian_psf

    psf = jnp.asarray(gaussian_psf(5, 1.0), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 3, 32, 32)) * 0.1 + 0.5, jnp.float32)
    a = np.asarray(admm_tv(x, 0.02, 1.0, psf, maxit=40, fft_impl="xla"))
    b = np.asarray(admm_tv(x, 0.02, 1.0, psf, maxit=40, fft_impl="mxu"))
    np.testing.assert_allclose(b, a, atol=2e-3)


@pytest.mark.parametrize("h,w", [(16, 16), (32, 24), (17, 23)])
def test_dht_freq_solve_matches_xla(rng, h, w):
    """Hartley path == complex path for per-axis-even spectra."""
    from torch_admm_deconv_tpu.ops.fdops import grad_otf_abs2
    from torch_admm_deconv_tpu.ops.mxu_fft import freq_solve_dht, mirror_freq_full

    s = jnp.asarray(rng.normal(size=(2, 3, h, w)), jnp.float32)
    freq_c = (1.0 / (1.0 + 0.7 * grad_otf_abs2((h, w)))).astype(jnp.float32)
    want = jnp.fft.irfft2(freq_c * jnp.fft.rfft2(s, axes=(-2, -1)), s=(h, w), axes=(-2, -1))
    got = freq_solve_dht(s, mirror_freq_full(freq_c, w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_solver_dht_matches_xla_denoise_and_symmetric_psf(rng):
    from tests.oracles.numpy_admm import gaussian_psf

    x = jnp.asarray(rng.normal(size=(1, 3, 32, 32)) * 0.1 + 0.5, jnp.float32)
    a = np.asarray(admm_tv(x, 0.05, 1.0, None, iso=True, maxit=40, fft_impl="xla"))
    b = np.asarray(admm_tv(x, 0.05, 1.0, None, iso=True, maxit=40, fft_impl="dht"))
    np.testing.assert_allclose(b, a, atol=2e-3)
    psf = jnp.asarray(gaussian_psf(5, 1.0), jnp.float32)
    a2 = np.asarray(admm_tv(x, 0.02, 1.0, psf, maxit=40, fft_impl="xla"))
    b2 = np.asarray(admm_tv(x, 0.02, 1.0, psf, maxit=40, fft_impl="dht"))
    np.testing.assert_allclose(b2, a2, atol=2e-3)


@pytest.mark.parametrize("h,w", [(16, 16), (32, 24), (17, 23)])
def test_dht_general_freq_solve_matches_xla_arbitrary_psf(rng, h, w):
    """Hartley-PAIR path (true 2-D DHT, 8 matmuls) == complex path for a
    jointly-even spectrum from an ARBITRARY (asymmetric) PSF."""
    from torch_admm_deconv_tpu.ops.fdops import grad_otf_abs2, psf_otf
    from torch_admm_deconv_tpu.ops.mxu_fft import (
        freq_solve_dht_general,
        mirror_freq_full_joint,
    )

    motion = np.zeros((1, 1, 5, 5), np.float32)
    motion[0, 0, 2, 1:5] = [0.4, 0.3, 0.2, 0.1]  # asymmetric
    otf = psf_otf(jnp.asarray(motion), (h, w))
    habs2 = (otf.real**2 + otf.imag**2).reshape(h, w // 2 + 1)
    freq_c = 1.0 / (habs2 + 0.5 * grad_otf_abs2((h, w), jnp.float32))
    s = jnp.asarray(rng.normal(size=(2, 3, h, w)), jnp.float32)
    want = jnp.fft.irfft2(
        freq_c * jnp.fft.rfft2(s, axes=(-2, -1)), s=(h, w), axes=(-2, -1)
    )
    got = freq_solve_dht_general(s, mirror_freq_full_joint(freq_c, w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_mirror_freq_full_joint_matches_fft2(rng):
    """The conjugate mirror rebuilds the exact full-grid spectrum."""
    h, w = 12, 10
    k = rng.random((5, 5)).astype(np.float32)
    kp = np.zeros((h, w), np.float32)
    kp[:5, :5] = k
    full = np.abs(np.fft.fft2(kp)) ** 2
    half = jnp.asarray(full[:, : w // 2 + 1])
    from torch_admm_deconv_tpu.ops.mxu_fft import mirror_freq_full_joint

    got = np.asarray(mirror_freq_full_joint(half, w))
    np.testing.assert_allclose(got, full, rtol=1e-5)


def test_psf_symmetry_detection():
    from tests.oracles.numpy_admm import gaussian_psf
    from torch_admm_deconv_tpu.ops.mxu_fft import psf_is_axis_symmetric

    assert psf_is_axis_symmetric(None)
    assert psf_is_axis_symmetric(jnp.asarray(gaussian_psf(7, 1.5)))
    motion = np.zeros((1, 1, 5, 5), np.float32)
    motion[0, 0, 2, 1:5] = 0.25  # asymmetric motion blur
    assert not psf_is_axis_symmetric(jnp.asarray(motion))


def test_solver_mxu_differentiable(rng):
    x = jnp.asarray(rng.normal(size=(1, 1, 16, 16)) * 0.1 + 0.5, jnp.float32)

    def loss(lmbd):
        return jnp.sum(admm_tv(x, lmbd, 1.0, maxit=5, fft_impl="mxu") ** 2)

    g = jax.grad(loss)(0.05)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
