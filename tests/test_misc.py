import jax
import jax.numpy as jnp
import numpy as np

from torch_admm_deconv_tpu.models import RestorerV2
from torch_admm_deconv_tpu.utils.profiling import StepTimer, chained_throughput, timed_fetch


def test_restorer_v2_works(rng):
    """The reference version is a dead stub (denoiser_v2.py:28,42); the
    completion must run and train."""
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 16)) * 0.1 + 0.5, jnp.float32)
    m = RestorerV2(
        in_channels=3,
        blocks_filters=[8, 8],
        blocks_gate_channels=[8, 8],
        blocks_attention_reduction=[2, 2],
        admms=[{"kern_size": (), "max_iters": 2, "iso": True}],
    )
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))

    g = jax.grad(lambda pp: jnp.mean((m.apply(pp, x) - 0.5) ** 2))(p)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree_util.tree_leaves(g))


def test_step_timer():
    t = StepTimer(window=5)
    assert t.tick() is None
    for _ in range(6):
        rate = t.tick()
    assert rate is not None and rate > 0
    assert t.total_steps == 7


def test_chained_throughput_measures_positive(rng):
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    per = chained_throughput(lambda v: v * 1.0001 + 0.1, x, chain=4, reps=2)
    assert np.isfinite(per)


def test_timed_fetch(rng):
    x = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    t = timed_fetch(jax.jit(lambda v: v + 1), x)
    assert t > 0
