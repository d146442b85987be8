"""Implicit (fixed-point) gradients vs the unrolled solver.

At convergence, the implicit-function-theorem VJP of ``admm_tv_implicit``
must match the gradients obtained by unrolling ``admm_tv`` through autodiff
(which is how the reference trains, deconv.py:103-115 + admmdeconv.py:63-64).
Small images + many iterations so both sides sit at the fixed point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_admm_deconv_tpu.ops.implicit import admm_tv_implicit
from torch_admm_deconv_tpu.ops.solver import admm_tv

MAXIT = 600
TOL = 1e-12
BWD = 400

# The deblur problem (small rho, small lmbd, 5x5 PSF) converges much more
# slowly than denoising: unrolled-600 gradients are still 100%+ away from
# the fixed point, so both sides need deep iteration counts to meet.
MAXIT_DEBLUR = 4000
BWD_DEBLUR = 4000


def _assert_close(a, b, name, rtol=3e-2):
    """|a-b| <= rtol * scale + atol floor.

    The floor matters for the rho gradient: at the fixed point the solution
    does not depend on rho (it only sets convergence speed), so the true
    gradient is ~0 — the implicit path returns exactly 0 while the unrolled
    path returns f32 trajectory noise (~1e-4); a pure relative check would
    divide noise by noise.
    """
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() <= rtol * scale + 1e-3, (
        f"{name}: unrolled {a.ravel()[:4]} vs implicit {b.ravel()[:4]}"
    )


def _problem(seed=0, shape=(1, 1, 16, 16)):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    return x, w


def _gauss_psf(size=5, sigma=1.2):
    ax = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return jnp.asarray((k / k.sum()).reshape(1, 1, size, size).astype(np.float32))


def _grads(loss_fn, argnums, *args):
    return jax.grad(loss_fn, argnums=argnums)(*args)


@pytest.mark.parametrize("iso,iso_mode", [(False, "sample"), (True, "joint")])
def test_implicit_matches_unrolled_denoise(iso, iso_mode):
    x, w = _problem()

    def loss_unrolled(xin, lmbd, rho):
        out = admm_tv(xin, lmbd, rho, None, iso=iso, maxit=MAXIT, iso_mode=iso_mode)
        return jnp.sum(out * w)

    def loss_implicit(xin, lmbd, rho):
        out = admm_tv_implicit(
            xin, lmbd, rho, None, iso=iso, maxit=MAXIT,
            tol=TOL, iso_mode=iso_mode, backward_iters=BWD,
        )
        return jnp.sum(out * w)

    gu = _grads(loss_unrolled, (0, 1, 2), x, 0.05, 1.0)
    gi = _grads(loss_implicit, (0, 1, 2), x, 0.05, 1.0)

    # forward parity first (both converged to the same fixed point)
    fu = loss_unrolled(x, 0.05, 1.0)
    fi = loss_implicit(x, 0.05, 1.0)
    assert np.allclose(fu, fi, rtol=1e-4, atol=1e-5)

    for a, b, name in zip(gu, gi, ("xin", "lmbd", "rho")):
        _assert_close(a, b, name)


def test_implicit_matches_unrolled_deblur_psf_grad():
    x, w = _problem(seed=1)
    psf = _gauss_psf()

    def loss_unrolled(xin, lmbd, rho, kern):
        out = admm_tv(xin, lmbd, rho, kern, iso=False, maxit=MAXIT_DEBLUR)
        return jnp.sum(out * w)

    def loss_implicit(xin, lmbd, rho, kern):
        out = admm_tv_implicit(
            xin, lmbd, rho, kern, iso=False, maxit=MAXIT_DEBLUR,
            tol=TOL, backward_iters=BWD_DEBLUR,
        )
        return jnp.sum(out * w)

    gu = _grads(loss_unrolled, (0, 1, 2, 3), x, 0.02, 0.8, psf)
    gi = _grads(loss_implicit, (0, 1, 2, 3), x, 0.02, 0.8, psf)

    for a, b, name in zip(gu, gi, ("xin", "lmbd", "rho", "kern")):
        _assert_close(a, b, name)


def test_implicit_forward_matches_solver_batch_rgb():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 3, 16, 16), dtype=np.float32))
    out_i = admm_tv_implicit(x, 0.05, 1.0, None, iso=False, maxit=MAXIT, tol=TOL)
    out_u = admm_tv(x, 0.05, 1.0, None, iso=False, maxit=MAXIT)
    assert out_i.shape == x.shape
    assert np.allclose(np.asarray(out_i), np.asarray(out_u), atol=1e-5)


def test_implicit_accepts_chw_and_none_kernel():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((3, 16, 16), dtype=np.float32))
    out = admm_tv_implicit(x, 0.05, 1.0, maxit=50, tol=1e-6)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_admm_deconv_layer_implicit_mode_trains():
    """ADMMDeconv(gradient_mode='implicit') forwards and yields finite,
    nonzero gradients for its learnable lambda/rho through the fixed point."""
    from torch_admm_deconv_tpu.models.admm_deconv import ADMMDeconv

    layer = ADMMDeconv(
        kern_size=(), max_iters=200, iso=True, iso_mode="sample",
        gradient_mode="implicit", implicit_tol=1e-8, implicit_backward_iters=60,
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 3, 16, 16), dtype=np.float32))
    target = jnp.clip(x + 0.02, 0.0, 1.0)
    params = layer.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean((layer.apply(p, x) - target) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_implicit_vmem_forward_matches_unrolled():
    """On VMEM-eligible shapes (w%128==0) the implicit forward runs the
    whole-solve-in-VMEM kernel (interpret mode on CPU); its output and
    implicit gradients must still match the unrolled scan solver."""
    from torch_admm_deconv_tpu.kernels.vmem_solver import adaptive_vmem_available

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 3, 16, 128), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    assert adaptive_vmem_available(
        x.shape, jnp.float32, None, True, "sample", return_state=True
    )

    def loss_unrolled(xin, lmbd, rho):
        out = admm_tv(xin, lmbd, rho, None, iso=True, maxit=400, iso_mode="sample")
        return jnp.sum(out * w)

    def loss_implicit(xin, lmbd, rho):
        out = admm_tv_implicit(
            xin, lmbd, rho, None, iso=True, maxit=400,
            tol=1e-7, iso_mode="sample", backward_iters=300,
        )
        return jnp.sum(out * w)

    fu = loss_unrolled(x, 0.05, 1.0)
    fi = loss_implicit(x, 0.05, 1.0)
    assert np.allclose(fu, fi, rtol=1e-4, atol=1e-4)

    gu = _grads(loss_unrolled, (0, 1, 2), x, 0.05, 1.0)
    gi = _grads(loss_implicit, (0, 1, 2), x, 0.05, 1.0)
    for a, b, name in zip(gu, gi, ("xin", "lmbd", "rho")):
        _assert_close(a, b, name)
