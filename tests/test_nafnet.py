import jax
import jax.numpy as jnp
import numpy as np

from torch_admm_deconv_tpu.models import NAFNet, NAFNetLocal, local_avg_pool2d, simple_gate


def test_simple_gate():
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 4, 1, 2))
    out = simple_gate(x)
    assert out.shape == (1, 2, 1, 2)
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(x)[0, 0] * np.asarray(x)[0, 2])


def test_nafnet_forward_and_padding(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 22, 26)), jnp.float32)  # not %4
    m = NAFNet(img_channel=3, width=8, middle_blk_num=1, enc_blk_nums=[1, 1], dec_blk_nums=[1, 1])
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_nafnet_zero_init_residual(rng):
    """beta/gamma init to zero => fresh NAFNet is near input + conv noise."""
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 16)), jnp.float32)
    m = NAFNet(img_channel=3, width=4, middle_blk_num=1, enc_blk_nums=[1], dec_blk_nums=[1])
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    # residual path: output contains the input
    assert float(jnp.corrcoef(out.ravel(), x.ravel())[0, 1]) > 0.5


def test_local_avg_pool_matches_cumsum_oracle(rng):
    x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
    k = (3, 3)
    got = np.asarray(local_avg_pool2d(jnp.asarray(x), k))
    assert got.shape == x.shape
    # manual oracle: the cumsum construction averages windows anchored top-left
    s = x.cumsum(-1).cumsum(-2)
    s = np.pad(s, ((0, 0), (0, 0), (1, 0), (1, 0)))
    w = (s[:, :, 3:, 3:] + s[:, :, :-3, :-3] - s[:, :, :-3, 3:] - s[:, :, 3:, :-3]) / 9.0
    np.testing.assert_allclose(got[:, :, 1:-1, 1:-1], w[:, :, : 6, : 6], atol=1e-5)


def test_nafnet_local_runs_large_input(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 48, 48)), jnp.float32)
    m = NAFNetLocal(train_size=(16, 16), img_channel=3, width=4,
                    middle_blk_num=1, enc_blk_nums=[1], dec_blk_nums=[1])
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_tlsc_kernel_matches_reference_calibration():
    """_sca_kernel must reproduce the kernel sizes the reference's
    Local_Base.convert calibration caches into each AvgPool2d — including
    a train size that needs check_image_size divisibility padding."""
    import sys

    try:
        import torch  # noqa: F401
    except ImportError:  # pragma: no cover
        import pytest

        pytest.skip("torch unavailable")
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    try:
        from admmtor.modelbuild.nafnet import NAFNetLocal as RefLocal
    except ImportError:  # pragma: no cover
        import pytest

        pytest.skip("reference package unavailable")

    th, tw = 58, 44  # 58 % 4 != 0: exercises the calibration padding
    ref = RefLocal(
        train_size=(1, 3, th, tw), img_channel=3, width=4,
        middle_blk_num=1, enc_blk_nums=[1, 1], dec_blk_nums=[1, 1],
    )
    ours = NAFNetLocal(
        train_size=(th, tw), img_channel=3, width=4,
        middle_blk_num=1, enc_blk_nums=[1, 1], dec_blk_nums=[1, 1],
    )

    def ref_kernel(block):
        return tuple(block.sca[0].kernel_size)

    for level, enc in enumerate(ref.encoders):
        assert ref_kernel(enc[0]) == ours._sca_kernel(level), f"enc level {level}"
    assert ref_kernel(ref.middle_blks[0]) == ours._sca_kernel(len(ref.encoders))
    for li, dec in enumerate(ref.decoders):
        level = len(ref.encoders) - 1 - li
        assert ref_kernel(dec[0]) == ours._sca_kernel(level), f"dec level {level}"
