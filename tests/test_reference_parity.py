"""Bit-level parity against the PyTorch reference solver, when available.

Imports the reference package from /root/reference (read-only). Skipped when
the reference or torch is absent so the suite stays self-contained — the
NumPy oracle in tests/oracles/numpy_admm.py provides the standing parity
check.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracles import numpy_admm as oracle
from torch_admm_deconv_tpu.ops.solver import admm_tv

REF_SRC = "/root/reference/src"


def _ref_solver():
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable")
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    try:
        from admmtor.eops.deconv import fft_admm_tv as ref_fft_admm_tv
    except ImportError:
        pytest.skip("reference package unavailable")
    return ref_fft_admm_tv


@pytest.mark.parametrize("iso", [False, True])
def test_denoise_parity_with_torch_reference(rng, iso):
    ref = _ref_solver()
    import torch

    x = (rng.normal(size=(2, 3, 32, 32)) * 0.1 + 0.5).astype(np.float32)
    want = ref(
        torch.from_numpy(x),
        torch.tensor([0.05]),
        torch.tensor([0.8]),
        torch.tensor([]),
        iso=iso,
        maxit=40,
    ).numpy()
    got = np.asarray(admm_tv(jnp.asarray(x), 0.05, 0.8, None, iso=iso, maxit=40))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_deblur_parity_with_torch_reference(rng):
    ref = _ref_solver()
    import torch

    psf = oracle.gaussian_psf(9, 1.5).astype(np.float32)
    x = (rng.normal(size=(1, 3, 64, 64)) * 0.1 + 0.5).astype(np.float32)
    want = ref(
        torch.from_numpy(x),
        torch.tensor([0.01]),
        torch.tensor([1.0]),
        torch.from_numpy(psf),
        iso=False,
        maxit=60,
    ).numpy()
    got = np.asarray(admm_tv(jnp.asarray(x), 0.01, 1.0, jnp.asarray(psf), iso=False, maxit=60))
    np.testing.assert_allclose(got, want, atol=5e-4)
