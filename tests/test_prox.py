import jax.numpy as jnp
import numpy as np

from torch_admm_deconv_tpu.ops import prox


def test_soft_thresh_closed_form(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 8)), jnp.float32)
    got = prox.soft_thresh(x, 0.3)
    want = np.sign(x) * np.maximum(np.abs(np.asarray(x)) - 0.3, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hard_thresh(rng):
    x = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    got = np.asarray(prox.hard_thresh(x, 0.5))
    xn = np.asarray(x)
    np.testing.assert_allclose(got, xn * (np.abs(xn) > 0.5))


def test_pixelnorm_reduces_batch_and_channel(rng):
    x = rng.normal(size=(2, 3, 5, 7))
    got = prox.pixelnorm(jnp.asarray(x, jnp.float64))
    want = np.sqrt(np.sum(x**2, axis=(0, 1)) + 1e-15)
    assert got.shape == (5, 7)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_block_thresh_compat_couples_batch(rng):
    """Reference quirk (deconv.py:23-24): result depends on batch composition."""
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 4)), jnp.float32)
    full = prox.block_thresh(x, 0.5, axis=(0, 1))
    single = prox.block_thresh(x[:1], 0.5, axis=(0, 1))
    assert not np.allclose(np.asarray(full[:1]), np.asarray(single))
    # per-sample mode decouples
    full_s = prox.block_thresh(x, 0.5, axis=(1,))
    single_s = prox.block_thresh(x[:1], 0.5, axis=(1,))
    np.testing.assert_allclose(np.asarray(full_s[:1]), np.asarray(single_s), atol=1e-6)


def test_block_thresh_joint_is_prox_of_l2(rng):
    """Joint shrinkage must equal the closed-form prox of tau*||.||_2."""
    zx = jnp.asarray(rng.normal(size=(1, 1, 4, 4)), jnp.float64)
    zy = jnp.asarray(rng.normal(size=(1, 1, 4, 4)), jnp.float64)
    tau = 0.4
    gx, gy = prox.block_thresh_joint(zx, zy, tau)
    mag = np.sqrt(np.asarray(zx) ** 2 + np.asarray(zy) ** 2)
    scale = np.maximum(1 - tau / np.maximum(mag, 1e-30), 0.0)
    np.testing.assert_allclose(np.asarray(gx), scale * np.asarray(zx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), scale * np.asarray(zy), atol=1e-6)


def test_abs2_complex():
    z = jnp.asarray([1 + 2j, 3 - 4j])
    np.testing.assert_allclose(np.asarray(prox.abs2(z)), [5.0, 25.0])
