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
