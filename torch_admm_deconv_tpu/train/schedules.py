"""LR schedules: cosine annealing with warm restarts.

The reference trains with torch CosineAnnealingWarmRestarts(T_0=15000,
eta_min=1e-11) (scripts/train.py:91). optax has no warm-restart cosine with
torch's exact semantics, so it is implemented directly:
lr(t) = eta_min + (base - eta_min) * (1 + cos(pi * t_cur / T_i)) / 2 with
T_i = T_0 * T_mult^i and t_cur the steps since the last restart.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_warm_restarts(
    base_lr: float, t_0: int, t_mult: int = 1, eta_min: float = 0.0
):
    """Returns a schedule fn: step -> lr (torch semantics, T_mult >= 1)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(step, t_0)
            t_i = float(t_0)
        else:
            # closed form for the geometric restart index
            n = jnp.floor(
                jnp.log1p((t_mult - 1.0) * step / t_0) / jnp.log(float(t_mult))
            )
            start = t_0 * (t_mult**n - 1.0) / (t_mult - 1.0)
            t_cur = step - start
            t_i = t_0 * (float(t_mult) ** n)
        return eta_min + (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return schedule
