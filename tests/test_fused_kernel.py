"""Fused Pallas iteration kernel vs the plain XLA elementwise chain.

Runs in Pallas interpret mode on CPU (tests/conftest.py forces the CPU
backend); the compiled TPU path is exercised by bench.py and the verify
drives.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torch_admm_deconv_tpu.kernels.fused_admm import (
    fused_elementwise_step,
    fused_step_available,
)
from torch_admm_deconv_tpu.ops.solver import _elementwise_step, admm_tv


def _inputs(rng, shape=(2, 3, 16, 128)):
    mk = lambda: jnp.asarray(rng.normal(size=shape), jnp.float32)  # noqa: E731
    return mk(), mk(), mk(), mk()


@pytest.mark.parametrize(
    "iso,iso_mode",
    [(False, "compat"), (True, "sample"), (True, "joint")],
)
def test_fused_matches_xla(rng, iso, iso_mode):
    x, ux, uy, hty = _inputs(rng)
    rho, tau = 0.7, 0.15
    s0, _, _, ux0, uy0 = _elementwise_step(x, ux, uy, hty, rho, tau, iso, iso_mode)
    s1, _, _, ux1, uy1 = fused_elementwise_step(x, ux, uy, hty, rho, tau, iso, iso_mode)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ux1), np.asarray(ux0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(uy1), np.asarray(uy0), atol=1e-6)


def test_availability_rules():
    assert fused_step_available((2, 3, 16, 128), jnp.float32, False, "compat")
    assert not fused_step_available((2, 3, 16, 128), jnp.float32, True, "compat")
    assert not fused_step_available((2, 3, 15, 128), jnp.float32, False, "compat")
    assert not fused_step_available((2, 3, 16, 100), jnp.float32, False, "compat")
    assert not fused_step_available((1, 1, 4096, 4096), jnp.float32, False, "compat")
    assert not fused_step_available((2, 3, 16, 128), jnp.bfloat16, False, "compat")


def test_solver_with_pallas_matches_without(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 32, 128)) * 0.1 + 0.5, jnp.float32)
    ref = np.asarray(admm_tv(x, 0.05, 1.0, None, maxit=20, use_pallas=False))
    got = np.asarray(admm_tv(x, 0.05, 1.0, None, maxit=20, use_pallas=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fallback_on_unaligned_shape(rng):
    """Unaligned W silently uses the XLA chain — same results."""
    x = jnp.asarray(rng.normal(size=(1, 1, 16, 100)), jnp.float32)
    ux = jnp.zeros_like(x)
    s0, *_ = _elementwise_step(x, ux, ux, x, 1.0, 0.1, False, "compat")
    s1, *_ = fused_elementwise_step(x, ux, ux, x, 1.0, 0.1, False, "compat")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-6)
