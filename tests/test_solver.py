import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracles import numpy_admm as oracle
from torch_admm_deconv_tpu.ops.solver import admm_tv, admm_tv_adaptive, tv_objective


def _blurred_image(rng, h=64, w=64, psf=None, noise=0.02):
    """Synthetic piecewise-smooth image, optionally blurred + noised."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = 0.3 + 0.5 * ((yy > h // 3) & (xx > w // 4)).astype(np.float64)
    img += 0.2 * ((yy - h / 2) ** 2 + (xx - w / 2) ** 2 < (h / 4) ** 2)
    if psf is not None:
        img = oracle.htran(img[None, None], np.flip(psf, axis=(-2, -1)))[0, 0]
    img = img + noise * rng.normal(size=img.shape)
    return np.clip(img, 0.0, 1.0)


@pytest.mark.parametrize("iso", [False, True])
def test_denoise_matches_numpy_oracle(rng, iso):
    """Empty-kernel (pure TV denoising) parity, 50 iters."""
    x = rng.normal(size=(2, 3, 32, 32)) * 0.1 + 0.5
    got = np.asarray(admm_tv(jnp.asarray(x, jnp.float32), 0.05, 0.8, None, iso=iso, maxit=50))
    want = oracle.fft_admm_tv(x, 0.05, 0.8, None, iso=iso, maxit=50)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pr1_config_matches_oracle(rng):
    """PR1 parity config: single 256x256 grayscale, 9x9 Gaussian PSF,
    non-blind, fixed rho, 100 iters (BASELINE.json config 1)."""
    psf = oracle.gaussian_psf(9, 1.5)
    img = _blurred_image(rng, 256, 256, psf=psf, noise=0.01)
    xin = img[None, None]
    got = np.asarray(
        admm_tv(jnp.asarray(xin, jnp.float32), 0.01, 1.0, jnp.asarray(psf, jnp.float32), iso=False, maxit=100)
    )
    want = oracle.fft_admm_tv(xin, 0.01, 1.0, psf, iso=False, maxit=100)
    np.testing.assert_allclose(got, want, atol=5e-4)
    # and the solve actually deblurs: TV objective below the input's
    j_in = float(tv_objective(jnp.asarray(xin), jnp.asarray(xin), 0.01, jnp.asarray(psf)))
    j_out = float(tv_objective(jnp.asarray(got), jnp.asarray(xin), 0.01, jnp.asarray(psf)))
    assert j_out < j_in


def test_even_kernel_matches_oracle(rng):
    """Asymmetric (even-size) PSF half-pads must match the oracle."""
    psf = oracle.gaussian_psf(4, 1.0)
    x = rng.normal(size=(1, 1, 24, 24)) * 0.1 + 0.5
    got = np.asarray(admm_tv(jnp.asarray(x, jnp.float32), 0.02, 1.0, jnp.asarray(psf, jnp.float32), maxit=30))
    want = oracle.fft_admm_tv(x, 0.02, 1.0, psf, maxit=30)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_input_rank_flexibility(rng):
    x2 = rng.normal(size=(16, 16)) * 0.1 + 0.5
    x3 = x2[None]
    x4 = x3[None]
    o2 = admm_tv(jnp.asarray(x2, jnp.float32), 0.05, 1.0, maxit=5)
    o3 = admm_tv(jnp.asarray(x3, jnp.float32), 0.05, 1.0, maxit=5)
    o4 = admm_tv(jnp.asarray(x4, jnp.float32), 0.05, 1.0, maxit=5)
    assert o2.shape == (16, 16) and o3.shape == (1, 16, 16) and o4.shape == (1, 1, 16, 16)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o4[0, 0]), atol=1e-6)


def test_differentiable_in_lmbd_rho_kern(rng):
    """Unrolled-ADMM training path: autodiff through the scan."""
    x = jnp.asarray(rng.normal(size=(1, 1, 16, 16)) * 0.1 + 0.5, jnp.float32)
    psf = jnp.asarray(oracle.gaussian_psf(3, 1.0), jnp.float32)
    target = jnp.ones_like(x) * 0.5

    def loss(lmbd, rho, kern):
        out = admm_tv(x, lmbd, rho, kern, maxit=8)
        return jnp.mean((out - target) ** 2)

    g_l, g_r, g_k = jax.grad(loss, argnums=(0, 1, 2))(0.05, 1.0, psf)
    assert np.isfinite(g_l) and np.isfinite(g_r)
    assert np.all(np.isfinite(np.asarray(g_k)))
    assert abs(float(g_l)) > 0


def test_remat_matches_plain(rng):
    x = jnp.asarray(rng.normal(size=(1, 1, 16, 16)), jnp.float32)

    def loss(lmbd, remat):
        return jnp.sum(admm_tv(x, lmbd, 1.0, maxit=10, remat=remat))

    v0, g0 = jax.value_and_grad(lambda l: loss(l, False))(0.05)
    v1, g1 = jax.value_and_grad(lambda l: loss(l, True))(0.05)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(float(g0), float(g1), rtol=1e-5)


def test_adaptive_converges_to_tolerance(rng):
    img = _blurred_image(rng, 64, 64, noise=0.05)
    res = admm_tv_adaptive(jnp.asarray(img[None, None], jnp.float32), 0.05, 1.0, None, maxit=400, tol=1e-4)
    assert int(res.iters) < 400, "did not converge before maxit"
    assert float(res.r_norm) <= 1e-4 and float(res.s_norm) <= 1e-4


def test_adaptive_rho_beats_fixed_iteration_count(rng):
    """Residual balancing should not be slower than fixed rho from a bad start."""
    img = _blurred_image(rng, 48, 48, noise=0.05)
    xin = jnp.asarray(img[None, None], jnp.float32)
    bad_rho = 50.0  # deliberately mis-scaled
    fixed = admm_tv_adaptive(xin, 0.05, bad_rho, None, maxit=500, tol=1e-4, adapt_rho=False)
    adapt = admm_tv_adaptive(xin, 0.05, bad_rho, None, maxit=500, tol=1e-4, adapt_rho=True)
    assert int(adapt.iters) <= int(fixed.iters)


def test_iso_modes_all_run(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 16, 16)), jnp.float32)
    outs = {
        mode: np.asarray(admm_tv(x, 0.05, 1.0, iso=True, iso_mode=mode, maxit=5))
        for mode in ("compat", "sample", "joint")
    }
    for mode, o in outs.items():
        assert np.all(np.isfinite(o)), mode
    assert not np.allclose(outs["compat"], outs["joint"])


def test_admm_tv_fast_frac_passthrough(rng):
    """admm_tv(fast_frac=...) reaches the VMEM kernel (bench.py's _FAST_FRAC
    plumbing): at batch 1 the compat iso mode maps to 'sample' and the VMEM
    path is eligible, so different fast_frac values must produce different
    (but close) iterates while fast_frac=0.0 matches precision='high'."""
    import numpy as np

    from torch_admm_deconv_tpu.ops.solver import admm_tv

    x = jnp.asarray(rng.normal(size=(1, 3, 32, 128)) * 0.1 + 0.5, jnp.float32)
    hi = np.asarray(admm_tv(x, 0.05, 0.8, None, iso=True, maxit=20,
                            use_pallas=True, precision="high"))
    f0 = np.asarray(admm_tv(x, 0.05, 0.8, None, iso=True, maxit=20,
                            use_pallas=True, precision="mixed", fast_frac=0.0))
    f9 = np.asarray(admm_tv(x, 0.05, 0.8, None, iso=True, maxit=20,
                            use_pallas=True, precision="mixed", fast_frac=0.9))
    np.testing.assert_array_equal(f0, hi)  # zero fast phase == exact kernel
    assert np.abs(f9 - hi).max() > 0.0  # the knob reached the kernel
    np.testing.assert_allclose(f9, hi, atol=5e-3)  # tail contracts roundoff
