"""RestorerV2 — a working completion of the reference's v2 sketch.

The reference's ``RestorerV2``/``RestorerV2Block``
(/root/reference/src/admmtor/modelbuild/denoiser_v2.py) are stubs: both
forwards are ``pass`` and the MultiScaleConvPool call has the wrong arity
(SURVEY.md known defects). This module completes the evident design —
multi-scale conv pooling blocks with LayerNorm and an optional MultiADMM
front-end — into a working model with the sketched constructor signature.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.blocks import MultiADMM, MultiScaleConvPool
from torch_admm_deconv_tpu.models.layers_common import Conv2d, LayerNorm2d


class RestorerV2Block(nn.Module):
    in_c: int
    filters: int
    out_c: int
    ks: Sequence[int] = (3, 5, 7)
    admms_dicts: Optional[Sequence[dict]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.admms_dicts:
            x = jnp.concatenate(
                [x, MultiADMM(self.admms_dicts, name="admms")(x)], axis=1
            )
        c_in = x.shape[1]
        h = LayerNorm2d(c_in, eps=1e-9, name="norm")(x)
        h = MultiScaleConvPool(c_in, self.out_c, self.filters, list(self.ks), name="msconv1")(h)
        res = Conv2d(c_in, self.out_c, 1, name="res_proj")(x)
        return jax.nn.gelu(h + res)


class RestorerV2(nn.Module):
    in_channels: int
    blocks_filters: Sequence[int]
    blocks_gate_channels: Sequence[int]  # kept for the sketched signature
    blocks_attention_reduction: Sequence[int]  # kept for the sketched signature
    admms: Optional[Sequence[dict]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = x
        c = self.in_channels
        for i, filters in enumerate(self.blocks_filters):
            out = RestorerV2Block(
                in_c=c,
                filters=filters,
                out_c=filters,
                admms_dicts=self.admms if i == 0 else None,
                name=f"block_{i}",
            )(out)
            c = filters
        out = Conv2d(c, self.in_channels, 1, name="head")(out)
        return jax.nn.sigmoid(out)
