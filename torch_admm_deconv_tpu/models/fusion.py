"""ADMM fusion layers: parallel deconvs + attention channel selection.

Capability parity with /root/reference/src/admmtor/elayers/admmfusion.py and
modelbuild/deconver.py (``Deconvs``, the channel-concat twin of MultiADMM).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.admm_deconv import ADMMDeconv
from torch_admm_deconv_tpu.models.attention import (
    AttentionChannelPooling,
    ChannelCompression,
)


class Deconvs(nn.Module):
    """Channel-concat of N ADMMDeconv layers (deconver.py:8-23)."""

    admms_args: Sequence[dict]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(
            [ADMMDeconv(**cfg, name=f"block_{i}")(x) for i, cfg in enumerate(self.admms_args)],
            axis=1,
        )


class ADMMFusion(nn.Module):
    """Run N differently-configured ADMMDeconvs, concat channels, select the
    best via AttentionChannelPooling; ``with_admms`` additionally passes the
    raw concat through (admmfusion.py:9-38)."""

    admms_cfgs: Sequence[dict]
    in_channels: int
    compressions: Sequence[ChannelCompression] = (
        ChannelCompression.STD,
        ChannelCompression.MEDIAN,
        ChannelCompression.MAX,
        ChannelCompression.MEAN,
    )
    probas_channels_factor: int = 2
    reduce_probas_space: bool = False
    with_admms: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fused = jnp.concatenate(
            [ADMMDeconv(**cfg, name=f"admm_{i}")(x) for i, cfg in enumerate(self.admms_cfgs)],
            axis=1,
        )
        selected = AttentionChannelPooling(
            self.in_channels * len(self.admms_cfgs),
            self.in_channels,
            self.compressions,
            self.probas_channels_factor,
            self.reduce_probas_space,
            name="acp",
        )(fused)
        if self.with_admms:
            return jnp.concatenate([selected, fused], axis=1)
        return selected
