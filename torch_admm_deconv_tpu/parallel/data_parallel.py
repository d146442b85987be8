"""Data parallelism: independent ADMM instances / model replicas per shard.

Beyond-reference capability (SURVEY.md §2.5): the image batch shards over
the ``data`` mesh axis; the solver instances are independent per image, so
the only collectives are the psum XLA inserts for global loss/metric
reductions and gradient averaging in the train step. Everything goes through
``jit`` with ``NamedSharding`` constraints — the idiomatic JAX SPMD path (no
hand-written collectives needed here; those live in parallel/spatial.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torch_admm_deconv_tpu.models.regularizers import (
    clip_grads_by_value,
    train_weight_clipper,
)
from torch_admm_deconv_tpu.ops.solver import admm_tv


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place an NCHW batch sharded over its batch dimension."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def data_parallel_solve(
    xin,
    lmbd,
    rho,
    kern=None,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    **solver_kwargs,
):
    """Batch-sharded classical TV-ADMM solve.

    Each shard solves its images independently; with the reference-compat
    batch-coupled iso mode the pixelnorm reduction spans the global batch,
    which XLA lowers to a psum over the mesh — semantics preserved across
    shardings.
    """
    if mesh is None:
        return admm_tv(xin, lmbd, rho, kern, **solver_kwargs)
    xin = shard_batch(xin, mesh, axis)
    out = admm_tv(xin, lmbd, rho, kern, **solver_kwargs)
    return out


def make_dp_train_step(
    model,
    tx,
    loss_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
    clip_value: float = 1.0,
    clamp_admm_params: bool = True,
):
    """Build a jitted data-parallel train step.

    Params/opt state replicate; batches shard over ``axis``. The loss is a
    global mean, so XLA inserts the gradient all-reduce automatically —
    no pmap/psum boilerplate.
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))

    @partial(
        jax.jit,
        in_shardings=(repl, repl, batch_sh, batch_sh, None),
        out_shardings=(repl, repl, None),
        donate_argnums=(0, 1),
    )
    def train_step(params, opt_state, x, y, lr):
        def lf(p):
            return loss_fn(model.apply(p, x), y)

        loss_val, grads = jax.value_and_grad(lf)(params)
        grads = clip_grads_by_value(grads, clip_value)
        if hasattr(opt_state, "hyperparams"):
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if clamp_admm_params:
            params = train_weight_clipper(params)
        return params, new_opt_state, loss_val

    return train_step
