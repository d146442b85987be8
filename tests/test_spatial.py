"""Spatially-sharded solver on the virtual 8-device CPU mesh vs the
single-device solver (SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracles import numpy_admm as oracle
from torch_admm_deconv_tpu.ops.solver import admm_tv
from torch_admm_deconv_tpu.parallel import (
    make_mesh,
    spatial_admm_tv,
    spatial_admm_tv_adaptive,
)
from torch_admm_deconv_tpu.parallel.spatial import irfft2_sharded, rfft2_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((8,), ("space",))


def test_distributed_fft_roundtrip(mesh, rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 32, 24)), jnp.float32)

    from functools import partial

    from jax.sharding import PartitionSpec as P

    def roundtrip(v):
        f = rfft2_sharded(v, "space", 8, 24)
        return irfft2_sharded(f, "space", 8, v.shape[-2], 24)

    fn = jax.jit(
        jax.shard_map(
            roundtrip,
            mesh=mesh,
            in_specs=P(None, None, "space", None),
            out_specs=P(None, None, "space", None),
        )
    )
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(x), atol=1e-5)


def test_distributed_fft_matches_rfft2(mesh, rng):
    """The transposed pencil FFT computes the same spectrum (reordered)."""
    x = jnp.asarray(rng.normal(size=(1, 1, 16, 16)), jnp.float32)
    from jax.sharding import PartitionSpec as P

    def fwd(v):
        return rfft2_sharded(v, "space", 8, 16)

    fn = jax.jit(
        jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=P(None, None, "space", None),
            out_specs=P(None, None, None, "space"),
        )
    )
    got = np.asarray(fn(x))  # (1,1,16, padded wf) sharded over freq cols
    want = np.fft.rfft2(np.asarray(x)[0, 0])
    wf = 16 // 2 + 1
    np.testing.assert_allclose(got[0, 0, :, :wf], want, atol=1e-4)


@pytest.mark.parametrize("iso,iso_mode", [(False, "compat"), (True, "compat"), (True, "joint")])
def test_spatial_matches_single_device_denoise(mesh, rng, iso, iso_mode):
    x = jnp.asarray(rng.normal(size=(2, 3, 32, 32)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.05, 0.8, None, iso=iso, maxit=30, iso_mode=iso_mode))
    tiled = np.asarray(
        spatial_admm_tv(x, 0.05, 0.8, None, iso=iso, maxit=30, mesh=mesh, iso_mode=iso_mode)
    )
    np.testing.assert_allclose(tiled, single, atol=2e-4)


def test_spatial_matches_single_device_deblur(mesh, rng):
    psf = jnp.asarray(oracle.gaussian_psf(9, 1.5), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 3, 64, 48)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.01, 1.0, psf, maxit=40))
    tiled = np.asarray(spatial_admm_tv(x, 0.01, 1.0, psf, maxit=40, mesh=mesh))
    np.testing.assert_allclose(tiled, single, atol=5e-4)


def test_spatial_adaptive_converges_jointly(mesh, rng):
    img = rng.normal(size=(1, 1, 64, 64)) * 0.1 + 0.5
    x = jnp.asarray(img, jnp.float32)
    res = spatial_admm_tv_adaptive(x, 0.05, 1.0, None, maxit=300, tol=1e-4, mesh=mesh)
    assert int(res.iters) < 300
    assert float(res.r_norm) <= 1e-4 and float(res.s_norm) <= 1e-4
    # all shards produced one agreed image
    assert res.x.shape == x.shape
    # matches the single-device adaptive result
    from torch_admm_deconv_tpu.ops.solver import admm_tv_adaptive

    ref = admm_tv_adaptive(x, 0.05, 1.0, None, maxit=300, tol=1e-4)
    assert abs(int(res.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=5e-4)


# -- MXU matmul-DFT pencil path (fft_impl='mxu', forced on CPU) -------------


def test_mxu_pencil_roundtrip(mesh, rng):
    from jax.sharding import PartitionSpec as P

    from torch_admm_deconv_tpu.ops.mxu_fft import dft_mats
    from torch_admm_deconv_tpu.parallel.spatial import (
        irfft2_sharded_mxu,
        rfft2_sharded_mxu,
    )

    x = jnp.asarray(rng.normal(size=(2, 3, 32, 24)), jnp.float32)
    mats = dft_mats(32, 24)

    def roundtrip(v):
        yr, yi = rfft2_sharded_mxu(v, "space", 8, 24, mats)
        return irfft2_sharded_mxu(yr, yi, "space", 8, 32, 24, mats)

    fn = jax.jit(
        jax.shard_map(
            roundtrip,
            mesh=mesh,
            in_specs=P(None, None, "space", None),
            out_specs=P(None, None, "space", None),
        )
    )
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(x), atol=1e-4)


def test_mxu_pencil_matches_rfft2(mesh, rng):
    from jax.sharding import PartitionSpec as P

    from torch_admm_deconv_tpu.ops.mxu_fft import dft_mats
    from torch_admm_deconv_tpu.parallel.spatial import rfft2_sharded_mxu

    x = jnp.asarray(rng.normal(size=(1, 1, 16, 16)), jnp.float32)
    mats = dft_mats(16, 16)

    def fwd(v):
        return rfft2_sharded_mxu(v, "space", 8, 16, mats)

    fn = jax.jit(
        jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=P(None, None, "space", None),
            out_specs=(P(None, None, None, "space"),) * 2,
        )
    )
    yr, yi = fn(x)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.rfft2(np.asarray(x)[0, 0])
    wf = 16 // 2 + 1
    np.testing.assert_allclose(got[0, 0, :, :wf], want, atol=1e-4)


@pytest.mark.parametrize("iso", [False, True])
def test_spatial_mxu_matches_single_device_denoise(mesh, rng, iso):
    x = jnp.asarray(rng.normal(size=(2, 3, 32, 32)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.05, 0.8, None, iso=iso, maxit=30))
    tiled = np.asarray(
        spatial_admm_tv(x, 0.05, 0.8, None, iso=iso, maxit=30, mesh=mesh,
                        fft_impl="mxu")
    )
    np.testing.assert_allclose(tiled, single, atol=5e-4)


def test_spatial_mxu_matches_single_device_deblur(mesh, rng):
    psf = jnp.asarray(oracle.gaussian_psf(9, 1.5), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 3, 64, 48)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.01, 1.0, psf, maxit=40))
    tiled = np.asarray(
        spatial_admm_tv(x, 0.01, 1.0, psf, maxit=40, mesh=mesh, fft_impl="mxu")
    )
    np.testing.assert_allclose(tiled, single, atol=1e-3)


def test_spatial_adaptive_mxu_converges(mesh, rng):
    img = rng.normal(size=(1, 1, 64, 64)) * 0.1 + 0.5
    x = jnp.asarray(img, jnp.float32)
    res = spatial_admm_tv_adaptive(x, 0.05, 1.0, None, maxit=300, tol=1e-4,
                                   mesh=mesh, fft_impl="mxu")
    ref = spatial_admm_tv_adaptive(x, 0.05, 1.0, None, maxit=300, tol=1e-4,
                                   mesh=mesh, fft_impl="xla")
    assert abs(int(res.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=5e-4)


# -- halo-margin local x-update (x_update_mode='halo') ----------------------


@pytest.mark.parametrize("iso,iso_mode", [(False, "compat"), (True, "joint")])
def test_halo_matches_single_device_denoise(mesh, rng, iso, iso_mode):
    """128 rows / 8 shards => h_local=16; halo=16 rows of true neighbour
    context makes the local x-update error ~exp(-halo/l) with l ~ 1 row."""
    x = jnp.asarray(rng.normal(size=(1, 3, 128, 32)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.05, 0.8, None, iso=iso, maxit=30, iso_mode=iso_mode))
    tiled = np.asarray(
        spatial_admm_tv(x, 0.05, 0.8, None, iso=iso, maxit=30, mesh=mesh,
                        iso_mode=iso_mode, x_update_mode="halo", halo=16)
    )
    np.testing.assert_allclose(tiled, single, atol=5e-4)


def test_halo_matches_single_device_deblur(mesh, rng):
    psf = jnp.asarray(oracle.gaussian_psf(9, 1.5), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 3, 128, 48)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.01, 1.0, psf, maxit=40))
    tiled = np.asarray(
        spatial_admm_tv(x, 0.01, 1.0, psf, maxit=40, mesh=mesh,
                        x_update_mode="halo", halo=16)
    )
    np.testing.assert_allclose(tiled, single, atol=1e-3)


def test_halo_deblur_dht_impl(mesh, rng):
    """Regression: on TPU 'auto' resolves to 'dht' for symmetric PSFs, and
    the halo x-update must feed mirror_freq_full a 2-D (H_pad, Wf) spectrum —
    the (1,1,kh,kw) kernel's leading dims once leaked into freq_c and crashed
    the Hartley path (round-4 advisor finding). CPU tests resolve 'auto' to
    'xla', so force 'dht' here."""
    psf = jnp.asarray(oracle.gaussian_psf(9, 1.5), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 3, 128, 48)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.01, 1.0, psf, maxit=40))
    tiled = np.asarray(
        spatial_admm_tv(x, 0.01, 1.0, psf, maxit=40, mesh=mesh,
                        x_update_mode="halo", halo=16, fft_impl="dht")
    )
    np.testing.assert_allclose(tiled, single, atol=1e-3)
    adaptive = spatial_admm_tv_adaptive(
        x, 0.01, 1.0, psf, maxit=60, tol=1e-3, mesh=mesh,
        x_update_mode="halo", halo=16, fft_impl="dht",
    )
    assert np.all(np.isfinite(np.asarray(adaptive.x)))


def test_halo_error_decays_with_margin(mesh, rng):
    """The halo width is an accuracy knob: error vs the exact solver must
    shrink as the margin grows."""
    x = jnp.asarray(rng.normal(size=(1, 1, 128, 32)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.05, 0.8, None, maxit=30))

    def err(halo):
        t = np.asarray(spatial_admm_tv(x, 0.05, 0.8, None, maxit=30, mesh=mesh,
                                       x_update_mode="halo", halo=halo))
        return float(np.max(np.abs(t - single)))

    e2, e8, e16 = err(2), err(8), err(16)
    assert e2 > e8 > e16, (e2, e8, e16)
    assert e16 < 5e-5, e16


def test_halo_one_shard_converges_with_margin(rng):
    """At n=1 the pad is the block's own wrap; the padded problem is an
    (H+2m)-periodic circulant, so a generous margin drives the error to fp
    noise (it is NOT bit-exact at any m)."""
    mesh1 = make_mesh((1,), ("space",))
    x = jnp.asarray(rng.normal(size=(1, 3, 32, 32)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.05, 0.8, None, maxit=30))
    tiled = np.asarray(spatial_admm_tv(x, 0.05, 0.8, None, maxit=30, mesh=mesh1,
                                       x_update_mode="halo", halo=16))
    np.testing.assert_allclose(tiled, single, atol=5e-5)


def test_halo_adaptive_converges_and_matches(mesh, rng):
    from torch_admm_deconv_tpu.ops.solver import admm_tv_adaptive

    img = rng.normal(size=(1, 1, 128, 64)) * 0.1 + 0.5
    x = jnp.asarray(img, jnp.float32)
    res = spatial_admm_tv_adaptive(x, 0.05, 1.0, None, maxit=300, tol=1e-4,
                                   mesh=mesh, x_update_mode="halo", halo=16)
    assert int(res.iters) < 300
    assert float(res.r_norm) <= 1e-4 and float(res.s_norm) <= 1e-4
    ref = admm_tv_adaptive(x, 0.05, 1.0, None, maxit=300, tol=1e-4)
    assert abs(int(res.iters) - int(ref.iters)) <= 2
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-3)


def test_sharded_programs_are_cached(mesh, rng):
    """A fresh jax.jit(shard_map(...)) per call re-traces every invocation
    (the round-4 TPU A/B initially measured that as a 10-21x 'overhead');
    repeated calls with the same static config must hit the lru_cache."""
    from torch_admm_deconv_tpu.parallel.spatial import _fixed_sharded_fn

    x = jnp.asarray(rng.normal(size=(1, 1, 32, 32)) * 0.1 + 0.5, jnp.float32)
    _fixed_sharded_fn.cache_clear()
    spatial_admm_tv(x, 0.05, 0.8, None, maxit=3, mesh=mesh)
    spatial_admm_tv(x, 0.05, 0.8, None, maxit=3, mesh=mesh)
    info = _fixed_sharded_fn.cache_info()
    assert info.misses == 1 and info.hits == 1, info
