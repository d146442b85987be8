"""Parity of the NCHW layer primitives against torch CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_admm_deconv_tpu.models import layers_common as lc  # noqa: E402


def _init(module, x):
    return module.init(jax.random.PRNGKey(0), x)


def test_conv2d_matches_torch(rng):
    x = rng.normal(size=(2, 4, 10, 12)).astype(np.float32)
    conv = lc.Conv2d(4, 6, 3, stride=2, padding=1)
    params = _init(conv, jnp.asarray(x))
    w = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])

    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
    want = tconv(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_groups_matches_torch(rng):
    x = rng.normal(size=(1, 6, 8, 8)).astype(np.float32)
    conv = lc.Conv2d(6, 6, 3, padding=1, groups=6)
    params = _init(conv, jnp.asarray(x))
    tconv = torch.nn.Conv2d(6, 6, 3, padding=1, groups=6)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(np.asarray(params["params"]["kernel"])))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
    want = tconv(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("stride,padding,k", [(1, 0, 3), (2, 1, 4), (1, 2, 5)])
def test_conv_transpose2d_matches_torch(rng, stride, padding, k):
    x = rng.normal(size=(2, 3, 9, 9)).astype(np.float32)
    conv = lc.ConvTranspose2d(3, 5, k, stride=stride, padding=padding)
    params = _init(conv, jnp.asarray(x))
    w = np.asarray(params["params"]["kernel"])  # our layout: (O, I, kh, kw)
    tconv = torch.nn.ConvTranspose2d(3, 5, k, stride=stride, padding=padding)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(1, 0, 2, 3)))  # torch: (I, O, kh, kw)
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
    want = tconv(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.normal(size=(2, 5, 7, 7)).astype(np.float32)
    norm = lc.InstanceNorm2d(5)
    params = _init(norm, jnp.asarray(x))
    tnorm = torch.nn.InstanceNorm2d(5, eps=1e-5, affine=True)
    want = tnorm(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(norm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layernorm2d_matches_reference_math(rng):
    """Channel layernorm per the reference's custom autograd fn
    (blocks.py:121-133)."""
    x = rng.normal(size=(2, 6, 4, 4)).astype(np.float32)
    ln = lc.LayerNorm2d(6)
    params = _init(ln, jnp.asarray(x))
    mu = x.mean(axis=1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=1, keepdims=True)
    want = (x - mu) / np.sqrt(var + 1e-6)
    got = np.asarray(ln.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unfold_fold_match_torch(rng):
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    got_u = np.asarray(lc.unfold(jnp.asarray(x), 4, 4))
    want_u = torch.nn.functional.unfold(torch.from_numpy(x), 4, stride=4).numpy()
    np.testing.assert_allclose(got_u, want_u, atol=1e-6)

    got_f = np.asarray(lc.fold(jnp.asarray(want_u), (8, 8), 4, 4))
    want_f = torch.nn.functional.fold(torch.from_numpy(want_u), (8, 8), 4, stride=4).numpy()
    np.testing.assert_allclose(got_f, want_f, atol=1e-6)

    # overlapping windows exercise the overlap-add path
    got_u2 = np.asarray(lc.unfold(jnp.asarray(x), 4, 2))
    want_u2 = torch.nn.functional.unfold(torch.from_numpy(x), 4, stride=2).numpy()
    np.testing.assert_allclose(got_u2, want_u2, atol=1e-6)
    got_f2 = np.asarray(lc.fold(jnp.asarray(want_u2), (8, 8), 4, 2))
    want_f2 = torch.nn.functional.fold(torch.from_numpy(want_u2), (8, 8), 4, stride=2).numpy()
    np.testing.assert_allclose(got_f2, want_f2, atol=1e-6)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.normal(size=(2, 8, 3, 5)).astype(np.float32)
    got = np.asarray(lc.pixel_shuffle(jnp.asarray(x), 2))
    want = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pools_match_torch(rng):
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    got = np.asarray(lc.max_pool2d(jnp.asarray(x), 2, 2))
    want = torch.nn.functional.max_pool2d(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(got, want)
    got = np.asarray(lc.avg_pool2d(jnp.asarray(x), 4, 4))
    want = torch.nn.functional.avg_pool2d(torch.from_numpy(x), 4).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_same_padding_matches_torch_reflect(rng):
    x = rng.normal(size=(1, 2, 6, 6)).astype(np.float32)
    got = np.asarray(lc.same_padding(jnp.asarray(x), 5))
    want = torch.nn.functional.pad(torch.from_numpy(x), (2, 2, 2, 2), mode="reflect").numpy()
    np.testing.assert_allclose(got, want)
