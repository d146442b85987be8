"""Composite-model construction/forward/grad tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_admm_deconv_tpu import models as M


def _run(module, x, key=0):
    p = module.init(jax.random.PRNGKey(key), x)
    out = module.apply(p, x)
    assert np.all(np.isfinite(np.asarray(out))), type(module).__name__
    return p, out


def test_admm_deconv_learnable_contract(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 16)) * 0.1 + 0.5, jnp.float32)
    # falsy lmbda/rho => learnable params exist
    m = M.ADMMDeconv(kern_size=(), max_iters=5, lmbda=None, rho=0.0, iso=True, bias=True)
    p, out = _run(m, x)
    assert set(p["params"].keys()) == {"lmbda", "rho", "b"}
    assert out.shape == x.shape
    # fixed lmbda/rho => no params
    m2 = M.ADMMDeconv(kern_size=(), max_iters=5, lmbda=0.1, rho=1.0)
    p2, _ = _run(m2, x)
    assert p2.get("params", {}) == {}
    # kernel => learnable PSF of the right shape
    m3 = M.ADMMDeconv(kern_size=(5, 5), max_iters=5, lmbda=0.1, rho=1.0, iso=False)
    p3, out3 = _run(m3, x)
    assert p3["params"]["w"].shape == (1, 1, 5, 5)
    assert out3.shape == x.shape


def test_admm_deconv_is_trainable(rng):
    x = jnp.asarray(rng.normal(size=(1, 1, 16, 16)) * 0.1 + 0.5, jnp.float32)
    m = M.ADMMDeconv(kern_size=(), max_iters=5)
    p = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.mean((m.apply(params, x) - 0.5) ** 2)

    g = jax.grad(loss)(p)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in flat)
    assert any(float(jnp.abs(v).max()) > 0 for v in flat)


def test_updown_block_preserves_spatial(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 12, 12)), jnp.float32)
    m = M.UpDownBlock(4, 4, 6, 3)
    _, out = _run(m, x)
    assert out.shape == (2, 6, 12, 12)


def test_divergent_attention_shapes(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 12, 12)), jnp.float32)
    m = M.DivergentAttention(
        branches=2, in_channels=3, out_channels=8, conv_filters=8,
        gate_channels=8, attention_reduction=2,
    )
    _, out = _run(m, x)
    assert out.shape == (1, 8, 12, 12)


def test_divergent_attention_with_admms(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 12, 12)) * 0.1 + 0.5, jnp.float32)
    admms = [{"kern_size": (), "max_iters": 3, "iso": True}] * 2
    m = M.DivergentAttention(
        branches=2, in_channels=3, out_channels=8, conv_filters=8,
        gate_channels=8, attention_reduction=2, admms=admms,
    )
    p, out = _run(m, x)
    assert out.shape == (1, 8, 12, 12)
    # quirk parity: only the first `branches` convs get used => conv_0 is a
    # 1x1 conv and conv_1 an UpDownBlock
    assert "admm_0" in p["params"] and "admm_1" in p["params"]


def test_divergent_restorer_tiny(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 16)) * 0.1 + 0.5, jnp.float32)
    m = M.DivergentRestorer(
        level_branches=[2, 2], in_channels=3, final_channels=3, filters=8,
        gate_channels=8, attention_reduction=2,
        output_activation=jax.nn.sigmoid,
        admms=[{"kern_size": (), "max_iters": 3, "iso": True}] * 2,
    )
    _, out = _run(m, x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1  # sigmoid output


def test_multiscale_conv_pool(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 10, 10)), jnp.float32)
    m = M.MultiScaleConvPool(4, 6, 8, [3, 5, 7])
    _, out = _run(m, x)
    assert out.shape == (2, 6, 10, 10)


def test_multi_admm_and_deconvs(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 8)) * 0.1 + 0.5, jnp.float32)
    cfgs = [{"kern_size": (), "max_iters": 2, "iso": False}] * 2
    _, out = _run(M.MultiADMM(cfgs), x)
    assert out.shape == (1, 6, 8, 8)
    _, out2 = _run(M.Deconvs(cfgs), x)
    assert out2.shape == (1, 6, 8, 8)


def test_admm_fusion(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 8)) * 0.1 + 0.5, jnp.float32)
    cfgs = [{"kern_size": (), "max_iters": 2}, {"kern_size": (), "max_iters": 3}]
    m = M.ADMMFusion(cfgs, in_channels=3)
    _, out = _run(m, x)
    assert out.shape == (1, 3, 8, 8)
    m2 = M.ADMMFusion(cfgs, in_channels=3, with_admms=True)
    _, out2 = _run(m2, x)
    assert out2.shape == (1, 9, 8, 8)


def test_autoencoder(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 20, 20)), jnp.float32)
    m = M.Autoencoder(3, [8, 16], [8, 3], [3, 3], activation=jax.nn.gelu)
    _, out = _run(m, x)
    assert out.shape[0] == 1 and out.shape[1] == 3


def test_updownscale_and_restorer(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 16)), jnp.float32)
    m = M.UpDownScale(3, [8, 8], [3, 3], activation=jax.nn.gelu)
    _, out = _run(m, x)
    assert out.shape == (1, 8, 16, 16)

    r = M.Restorer(
        inc_channels=3,
        autoencoder_args=dict(in_channels=6, enc_out_channels=[8, 8], dec_out_channels=[8, 4], kernel_sizes=[3, 3]),
        updownscale_args=dict(in_channels=6, out_channels=[8, 8], kernel_sizes=[3, 3]),
        deconvs_args=[{"kern_size": (), "max_iters": 2}] * 2,
    )
    _, out2 = _run(r, x)
    assert out2.shape == (1, 3, 16, 16)


def test_depthwise_down_block_fixed(rng):
    """Broken in the reference (blocks.py:333); must work here."""
    x = jnp.asarray(rng.normal(size=(1, 4, 10, 10)), jnp.float32)
    m = M.DepthwiseDownBlock(4, 8, 3, activation=jax.nn.relu)
    _, out = _run(m, x)
    assert out.shape == (1, 8, 8, 8)


def test_channelwise_variance_matches_unfold_math(rng):
    x = rng.normal(size=(1, 2, 6, 6)).astype(np.float32)
    got = np.asarray(M.channelwise_variance(jnp.asarray(x), 3, 1, 1))
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    want = np.zeros_like(got)
    for i in range(6):
        for j in range(6):
            patch = xp[:, :, i : i + 3, j : j + 3].reshape(1, 2, -1)
            want[:, :, i, j] = patch.var(axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_parallel_upsample_reduce(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8)), jnp.float32)
    m = M.ParallelUpsampleReduce(4, 2, 3, [3, 5, 7])
    _, out = _run(m, x)
    assert out.shape == (1, 4, 8, 8)


def test_local_attention_patch(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 8)), jnp.float32)
    m = M.LocalAttentionPatch(patch_size=4, stride=4, num_processors=4)
    _, out = _run(m, x)
    assert out.shape == x.shape


def test_regularizer_clippers():
    params = {"admm_0": {"lmbda": jnp.asarray([7.0]), "rho": jnp.asarray([-1.0]),
                         "w": jnp.asarray([[2.0]]), "b": jnp.asarray([9.0])}}
    c = M.train_weight_clipper(params)
    assert float(c["admm_0"]["lmbda"][0]) == 5.0
    assert float(c["admm_0"]["rho"][0]) == 1e-12
    assert float(c["admm_0"]["w"][0, 0]) == 2.0  # untouched
    c2 = M.admm_clipper(params, 5.0)
    assert float(c2["admm_0"]["b"][0]) == 5.0
    c3 = M.admm_weight_clipper(params, (-0.5, 0.5))
    assert float(c3["admm_0"]["w"][0, 0]) == 0.5

    grads = {"a": jnp.asarray([3.0, -3.0, 0.5])}
    g = M.clip_grads_by_value(grads, 1.0)
    np.testing.assert_allclose(np.asarray(g["a"]), [1.0, -1.0, 0.5])
