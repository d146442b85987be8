"""From-scratch BM3D (ops/bm3d.py) — the reference's third benchmark column
(eval_algs.ipynb cell 3), reimplemented with zero external deps."""

import numpy as np
import pytest

from torch_admm_deconv_tpu.ops.bm3d import (
    _dct_mat,
    _fwd3d,
    _inv3d,
    bm3d,
    estimate_sigma,
)


@pytest.fixture
def scene(rng):
    size = 96
    img = 0.5 + 0.15 * rng.standard_normal((8, 8, 3)).repeat(size // 8, 0).repeat(
        size // 8, 1
    )
    for _ in range(8):
        y0, x0 = rng.integers(0, size - 16, 2)
        hh, ww = rng.integers(6, 16, 2)
        img[y0 : y0 + hh, x0 : x0 + ww] = rng.random(3)
    return np.clip(img, 0, 1).astype(np.float32)


def _psnr(a, b):
    return 10 * np.log10(1.0 / np.mean((a - b) ** 2))


def test_dct3d_roundtrip(rng):
    g = rng.random((16, 3, 5, 8, 8)).astype(np.float32)
    d2, d1 = _dct_mat(8), _dct_mat(16)
    np.testing.assert_allclose(_inv3d(_fwd3d(g, d2, d1), d2, d1), g, atol=1e-5)
    # orthonormality
    np.testing.assert_allclose(d2 @ d2.T, np.eye(8), atol=1e-6)


def test_estimate_sigma_accuracy(rng, scene):
    sigma = 15 / 255
    noisy = np.clip(scene + sigma * rng.standard_normal(scene.shape), 0, 1)
    est = estimate_sigma(noisy.astype(np.float32), channel_axis=-1)
    assert abs(est - sigma) / sigma < 0.25, (est, sigma)


def test_bm3d_denoises(rng, scene):
    sigma = 15 / 255
    noisy = np.clip(scene + sigma * rng.standard_normal(scene.shape), 0, 1).astype(
        np.float32
    )
    out = bm3d(noisy, sigma)
    assert out.shape == noisy.shape and out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    gain = _psnr(out, scene) - _psnr(noisy, scene)
    assert gain > 4.0, gain  # typically ~6-7 dB on this scene
    # stage 2 (Wiener) must not be a regression over stage 1
    out1 = bm3d(noisy, sigma, stages=1)
    assert _psnr(out, scene) >= _psnr(out1, scene) - 0.2


def test_bm3d_grayscale_and_identity_on_clean(rng, scene):
    gray = scene[..., 0]
    sigma = 10 / 255
    noisy = np.clip(gray + sigma * rng.standard_normal(gray.shape), 0, 1).astype(
        np.float32
    )
    out = bm3d(noisy, sigma)
    assert out.shape == gray.shape
    assert _psnr(out, gray) > _psnr(noisy, gray) + 3.0
    # near-clean input with tiny sigma stays near-clean
    out_clean = bm3d(gray.astype(np.float32), 1 / 255)
    assert _psnr(out_clean, gray) > 38.0
