import jax.numpy as jnp
import numpy as np

from tests.oracles import numpy_admm as oracle
from torch_admm_deconv_tpu.ops import fdops


def test_dx_dy_match_oracle(rng):
    x = rng.normal(size=(2, 3, 6, 7))
    xj = jnp.asarray(x)
    np.testing.assert_allclose(fdops.dx(xj), oracle.dx(x), atol=1e-12)
    np.testing.assert_allclose(fdops.dy(xj), oracle.dy(x), atol=1e-12)
    np.testing.assert_allclose(fdops.dx_t(xj), oracle.dx_t(x), atol=1e-12)
    np.testing.assert_allclose(fdops.dy_t(xj), oracle.dy_t(x), atol=1e-12)


def test_adjointness(rng):
    """<D a, b> == <a, D^T b> under the periodic inner product."""
    a = jnp.asarray(rng.normal(size=(1, 1, 8, 8)))
    b = jnp.asarray(rng.normal(size=(1, 1, 8, 8)))
    for fwd, adj in [(fdops.dx, fdops.dx_t), (fdops.dy, fdops.dy_t)]:
        lhs = jnp.sum(fwd(a) * b)
        rhs = jnp.sum(a * adj(b))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-10)


def test_grad_otf_abs2_matches_fft_oracle():
    """Closed-form 4 sin^2 denominator == rfft2 of the padded 2x2 kernels."""
    h, w = 16, 24
    got = np.asarray(fdops.grad_otf_abs2((h, w), jnp.float64))
    dxk = np.zeros((h, w))
    dxk[1, 0], dxk[1, 1] = -1.0, 1.0
    dyk = np.zeros((h, w))
    dyk[0, 1], dyk[1, 1] = -1.0, 1.0
    want = np.abs(np.fft.rfft2(dxk)) ** 2 + np.abs(np.fft.rfft2(dyk)) ** 2
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_freq_denominator_with_kernel():
    kern = oracle.gaussian_psf(9, 1.5)
    got = np.asarray(fdops.freq_denominator((32, 32), 0.7, jnp.asarray(kern), jnp.float64))
    want = oracle.freq_denominator((32, 32), 0.7, kern)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_htran_matches_oracle(rng):
    x = rng.normal(size=(2, 3, 16, 16))
    for size, sigma in [(9, 1.5), (4, 1.0), (7, 2.0)]:
        kern = oracle.gaussian_psf(size, sigma)
        ht = fdops.htran_operator(jnp.asarray(kern))
        got = np.asarray(ht(jnp.asarray(x)))
        want = oracle.htran(x, kern)
        np.testing.assert_allclose(got, want, atol=1e-10, err_msg=f"psf {size}")


def test_htran_fft_matches_spatial_oracle(rng):
    """Frequency-domain H^T (the solver's path) == the spatial oracle."""
    x = rng.normal(size=(2, 3, 16, 16))
    for size, sigma in [(9, 1.5), (4, 1.0), (5, 2.0)]:
        kern = oracle.gaussian_psf(size, sigma)
        otf_c = fdops.psf_otf_centered(jnp.asarray(kern), (16, 16))
        got = np.asarray(fdops.htran_fft(jnp.asarray(x), otf_c, (16, 16)))
        want = oracle.htran(x, kern)
        np.testing.assert_allclose(got, want, atol=1e-10, err_msg=f"psf {size}")


def test_htran_empty_kernel_is_identity(rng):
    x = jnp.asarray(rng.normal(size=(1, 1, 4, 4)))
    assert fdops.htran_operator(None)(x) is x
    assert fdops.htran_operator(jnp.zeros((0,)))(x) is x


def test_htran_adjoint_of_h(rng):
    """<H a, b> == <a, H^T b> where H is the centered circular convolution."""
    kern = oracle.gaussian_psf(5, 1.0)
    a = rng.normal(size=(1, 1, 12, 12))
    b = rng.normal(size=(1, 1, 12, 12))
    kh, kw = 5, 5
    top, left = (kh - 1) // 2, (kw - 1) // 2
    k = kern.reshape(kh, kw)
    # H: circular convolution with same centering as oracle.htran's adjoint
    ha = np.zeros_like(a)
    for i in range(kh):
        for j in range(kw):
            ha += k[i, j] * np.roll(a, (i - top, j - left), axis=(-2, -1))
    lhs = np.sum(ha * b)
    rhs = np.sum(a * oracle.htran(b, kern))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    # and the jax H^T agrees with the oracle H^T (already covered above)
    got = np.asarray(fdops.htran_operator(jnp.asarray(kern))(jnp.asarray(b)))
    np.testing.assert_allclose(got, oracle.htran(b, kern), atol=1e-10)
