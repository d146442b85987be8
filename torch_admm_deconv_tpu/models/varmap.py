"""Sliding-window channel-wise variance maps.

Capability parity with /root/reference/src/admmtor/elayers/varmap.py —
re-expressed as a single fused reduce-window pipeline instead of the
reference's unfold/mean/var/fold round trip (TPU: no patch materialization,
var = E[x^2] - E[x]^2 via two windowed sums XLA fuses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def channelwise_variance(
    x: jnp.ndarray, kernel_size: int = 3, stride: int = 1, padding: int = 1
) -> jnp.ndarray:
    """(B, C, H, W) -> per-channel local variance map (B, C, H', W').
    Biased variance (torch ``patches.var`` path uses ``.mean(dim=2)`` of
    squared deviations, varmap.py:46-49)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))

    def window_sum(v):
        return jax.lax.reduce_window(
            v,
            0.0,
            jax.lax.add,
            (1, 1, kernel_size, kernel_size),
            (1, 1, stride, stride),
            "VALID",
        )

    n = kernel_size * kernel_size
    mean = window_sum(xp) / n
    mean_sq = window_sum(xp * xp) / n
    return mean_sq - mean * mean


class ChannelwiseVariance(nn.Module):
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return channelwise_variance(x, self.kernel_size, self.stride, self.padding)
