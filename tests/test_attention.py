import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_admm_deconv_tpu.models import attention as att


def test_channel_stats_match_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 4, 6, 6)).astype(np.float32)
    tx = torch.from_numpy(x)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(
        np.asarray(att.amean(xj)), tx.flatten(2).mean(-1).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(att.astd(xj)), tx.flatten(2).std(-1).numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(att.amax(xj)), tx.flatten(2).max(-1).values.numpy())
    np.testing.assert_allclose(np.asarray(att.amin(xj)), tx.flatten(2).min(-1).values.numpy())
    np.testing.assert_allclose(
        np.asarray(att.amedian(xj)), tx.flatten(2).median(-1).values.numpy()
    )


def test_mode_with_repeats_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.array([[1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 0.5]], np.float32)
    got = np.asarray(att.mode_along_last(jnp.asarray(x)))
    want = torch.mode(torch.from_numpy(x), -1).values.numpy()
    np.testing.assert_allclose(got, want)
    # tie: two values appear twice -> smallest wins
    x2 = np.array([[5.0, 5.0, 1.0, 1.0, 9.0]], np.float32)
    got2 = np.asarray(att.mode_along_last(jnp.asarray(x2)))
    np.testing.assert_allclose(got2, [1.0])


def test_logsumexp_2d_matches_closed_form(rng):
    x = rng.normal(size=(2, 3, 4, 4))
    got = np.asarray(att.logsumexp_2d(jnp.asarray(x)))
    want = np.log(np.exp(x.reshape(2, 3, -1)).sum(-1, keepdims=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cwa_shapes_and_modes(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 6)), jnp.float32)
    key = jax.random.PRNGKey(0)
    m = att.ChannelWiseAttention(8)
    p = m.init(key, x)
    out = m.apply(p, x)
    assert out.shape == x.shape

    probas = att.ChannelWiseAttention(8, probas_only=True, reduce_mean=True)
    p2 = probas.init(key, x)
    out2 = probas.apply(p2, x)
    assert out2.shape == (2, 8)
    assert np.all(np.asarray(out2) >= 0) and np.all(np.asarray(out2) <= 1)

    reduced = att.ChannelWiseAttention(8, reduce_probas_space=True)
    p3 = reduced.init(key, x)
    # bottleneck shrinks instead of expanding
    assert p3["params"]["conv1"]["kernel"].shape[0] == 4


def test_attention_channel_pooling_selects_per_sample(rng):
    x = jnp.asarray(rng.normal(size=(3, 10, 5, 5)), jnp.float32)
    m = att.AttentionChannelPooling(10, 4)
    p = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(p, x)
    assert out.shape == (3, 4, 5, 5)
    # every selected map must be one of the input channel maps of that sample
    xn, on = np.asarray(x), np.asarray(out)
    for b in range(3):
        for k in range(4):
            diffs = np.abs(xn[b] - on[b, k][None]).reshape(10, -1).max(axis=1)
            assert diffs.min() < 1e-6


def test_cbam_variants(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 8, 8)), jnp.float32)
    for pool_types in [("avg", "max"), ("lp", "lse")]:
        m = att.CBAM(16, reduction_ratio=4, pool_types=pool_types, use_spatial=True)
        p = m.init(jax.random.PRNGKey(2), x)
        out = m.apply(p, x)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))


def test_channel_pool_stacks_std_median_mode(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 4, 4)), jnp.float32)
    out = att.channel_pool(x)
    assert out.shape == (2, 3, 4, 4)
