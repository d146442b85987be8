"""Overlap-discard tiled inference (torch_admm_deconv_tpu/infer.py)."""

import numpy as np
import pytest

from torch_admm_deconv_tpu.infer import restore_image, tiled_apply


def _box3(img_chw):
    """3x3 box filter with reflect boundaries (receptive field 1 px)."""
    p = np.pad(img_chw, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    out = np.zeros_like(img_chw)
    for dy in range(3):
        for dx in range(3):
            out += p[:, dy : dy + img_chw.shape[1], dx : dx + img_chw.shape[2]]
    return out / 9.0


def _batched(fn):
    return lambda batch: np.stack([fn(b) for b in np.asarray(batch)])


@pytest.mark.parametrize("shape", [(3, 200, 300), (1, 64, 64), (3, 130, 37), (3, 1, 500)])
def test_identity_roundtrip(rng, shape):
    img = rng.random(shape).astype(np.float32)
    out = tiled_apply(_batched(lambda t: t), img, tile=64, margin=8, max_batch=3)
    np.testing.assert_array_equal(out, img)


def test_local_op_matches_whole_image(rng):
    """A shift-invariant local op (receptive field << margin) tiled must
    equal the whole-image computation everywhere: interior tiles see true
    neighbors inside the margin, border tiles see the same reflect pad."""
    img = rng.random((3, 150, 220)).astype(np.float32)
    want = _box3(img)
    got = tiled_apply(_batched(_box3), img, tile=64, margin=8, max_batch=4)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_single_tile_small_image(rng):
    img = rng.random((3, 40, 50)).astype(np.float32)
    got = tiled_apply(_batched(_box3), img, tile=64, margin=8)
    np.testing.assert_allclose(got, _box3(img), atol=1e-6)


def test_margin_validation(rng):
    img = rng.random((1, 32, 32)).astype(np.float32)
    with pytest.raises(ValueError):
        tiled_apply(_batched(lambda t: t), img, tile=64, margin=32)
    with pytest.raises(ValueError):
        tiled_apply(_batched(lambda t: t), img[0], tile=64, margin=8)


def test_classical_restorer_tiled_close_to_whole(rng):
    """Tiled TV-ADMM denoise vs whole-image solve: interiors must agree to
    a small tolerance (TV diffusion length << margin at these settings)."""
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.ops.solver import admm_tv

    clean = np.zeros((1, 96, 96), np.float32)
    clean[:, 24:72, 24:72] = 0.8
    noisy = clean + rng.normal(size=clean.shape).astype(np.float32) * 0.05

    def apply_fn(batch):
        return admm_tv(jnp.asarray(batch), 0.05, 1.0, None, iso=False, maxit=30)

    whole = np.asarray(apply_fn(noisy[None]))[0]
    tiled = restore_image(apply_fn, noisy, tile=64, margin=16, max_batch=4)
    # compare away from the outer boundary (whole-image solve is periodic,
    # the tiler reflect-pads — both are boundary conditions, interiors agree)
    np.testing.assert_allclose(
        tiled[:, 20:-20, 20:-20], np.clip(whole, 0, 1)[:, 20:-20, 20:-20], atol=0.02
    )
