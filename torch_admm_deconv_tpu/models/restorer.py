"""UpDownScale + Restorer fusion model — the reference versions are dead on
arrival (``UpDownBock`` NameError at restorer.py:23 / updownscale.py:35,
SURVEY.md known defects); implemented here working, with the intended wiring.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.autoencoder import Autoencoder
from torch_admm_deconv_tpu.models.blocks import (
    UpDownBlock,
    compute_enc_input_channels,
    compute_residual_dec_input_channels,
)
from torch_admm_deconv_tpu.models.fusion import Deconvs


class UpDownScale(nn.Module):
    """Two halves of UpDown blocks with skip concats (updownscale.py:4-57,
    fixed)."""

    in_channels: int
    out_channels: Sequence[int]
    kernel_sizes: Sequence[int]
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert len(self.out_channels) == len(self.kernel_sizes)
        assert len(self.out_channels) % 2 == 0, "Module must have even number of blocks"
        half = len(self.out_channels) // 2
        first_out = list(self.out_channels[:half])
        first_in = compute_enc_input_channels(self.in_channels, first_out)
        first_ks = list(self.kernel_sizes[:half])
        sec_out = list(self.out_channels[half:])
        sec_in = compute_residual_dec_input_channels(first_out, sec_out)
        sec_ks = list(self.kernel_sizes[half:])

        feats: List[jnp.ndarray] = []
        h = x
        for i, (ic, oc, ks) in enumerate(zip(first_in, first_out, first_ks)):
            h = UpDownBlock(ic, oc, oc, ks, self.activation, name=f"first_{i}")(h)
            feats.append(h)

        feats = feats[::-1]
        out = UpDownBlock(sec_in[0], sec_out[0], sec_out[0], sec_ks[0], self.activation, name="second_0")(
            feats[0]
        )
        for i in range(1, len(feats)):
            out = UpDownBlock(
                sec_in[i], sec_out[i], sec_out[i], sec_ks[i], self.activation, name=f"second_{i}"
            )(jnp.concatenate([feats[i], out], axis=1))
        return out


class Restorer(nn.Module):
    """Deconvs front-end -> [autoencoder | passthrough | updownscale] concat
    -> UpDown output block (restorer.py:8-28, fixed)."""

    inc_channels: int
    autoencoder_args: Dict
    updownscale_args: Dict
    deconvs_args: Sequence[Dict]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        deconv_out = Deconvs(self.deconvs_args, name="deconvs")(x)
        ae = Autoencoder(**self.autoencoder_args, name="autoencoder")(deconv_out)
        uds = UpDownScale(**self.updownscale_args, name="updownscale")(deconv_out)
        comb = jnp.concatenate([ae, deconv_out, uds], axis=1)
        last_in = (
            self.autoencoder_args["dec_out_channels"][-1]
            + self.updownscale_args["out_channels"][-1]
            + len(self.deconvs_args) * self.inc_channels
        )
        return UpDownBlock(
            last_in,
            last_in // 2,
            self.inc_channels,
            7,
            activation=lambda v: jnp.clip(jax.nn.relu(v), 0.0, 6.0),  # ReLU6
            name="out_block",
        )(comb)
