import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_admm_deconv_tpu import models as M
from torch_admm_deconv_tpu.metrics import MSE
from torch_admm_deconv_tpu.ops.solver import admm_tv
from torch_admm_deconv_tpu.parallel import (
    data_parallel_solve,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from torch_admm_deconv_tpu.train import make_optimizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((8,), ("data",))


def test_dp_solve_matches_single_device(mesh, rng):
    x = jnp.asarray(rng.normal(size=(16, 3, 32, 32)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.05, 0.8, None, maxit=20))
    dp = np.asarray(data_parallel_solve(x, 0.05, 0.8, None, mesh=mesh, maxit=20))
    np.testing.assert_allclose(dp, single, atol=1e-5)


def test_dp_solve_compat_iso_couples_global_batch(mesh, rng):
    """The batch-coupled pixelnorm must span the GLOBAL batch, not the
    per-shard batch — XLA inserts the cross-device reduction."""
    x = jnp.asarray(rng.normal(size=(16, 3, 16, 16)) * 0.1 + 0.5, jnp.float32)
    single = np.asarray(admm_tv(x, 0.05, 0.8, None, iso=True, iso_mode="compat", maxit=10))
    dp = np.asarray(
        data_parallel_solve(x, 0.05, 0.8, None, mesh=mesh, iso=True, iso_mode="compat", maxit=10)
    )
    np.testing.assert_allclose(dp, single, atol=1e-5)


def test_dp_train_step_runs_and_improves(mesh, rng):
    model = M.Conv2d(3, 3, 3, padding=1)
    x0 = jnp.asarray(rng.normal(size=(16, 3, 16, 16)), jnp.float32)
    y0 = x0 * 0.5
    params = model.init(jax.random.PRNGKey(0), x0)
    tx = make_optimizer(1e-2)
    opt_state = tx.init(params)
    loss = MSE("cpu")
    step = make_dp_train_step(model, tx, loss, mesh)
    x = shard_batch(x0, mesh)
    y = shard_batch(y0, mesh)
    losses = []
    for _ in range(10):
        params, opt_state, lv = step(params, opt_state, x, y, 1e-2)
        losses.append(float(lv))
    assert losses[-1] < losses[0]
