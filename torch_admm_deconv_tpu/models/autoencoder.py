"""U-Net-ish autoencoder with skip concats.

Capability parity with /root/reference/src/admmtor/modelbuild/autoencoder.py:
encoder = chain of DownBlocks collecting every intermediate, decoder =
UpBlocks consuming the reversed encoder outputs with channel concat skips;
channel wiring computed by the helpers in blocks.py.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.blocks import (
    DownBlock,
    UpBlock,
    compute_enc_input_channels,
    compute_residual_dec_input_channels,
)

IntOrPair = Union[int, Tuple[int, int]]


class Encoder(nn.Module):
    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel_sizes: Sequence[IntOrPair]
    activation: Optional[Callable] = None
    pool_size: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        for i, (ic, oc, ks) in enumerate(
            zip(self.in_channels, self.out_channels, self.kernel_sizes)
        ):
            x = DownBlock(ic, oc, ks, self.activation, None, self.pool_size, name=f"block_{i}")(x)
            outs.append(x)
        return outs


class Decoder(nn.Module):
    in_channels: Sequence[int]
    out_channels: Sequence[int]
    kernel_sizes: Sequence[IntOrPair]
    activation: Optional[Callable] = None
    pool_size: int = 0

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> jnp.ndarray:
        xs = xs[::-1]  # reference mutates with list.reverse (autoencoder.py:88)
        out = UpBlock(
            self.in_channels[0],
            self.out_channels[0],
            self.kernel_sizes[0],
            self.activation,
            None,
            self.pool_size,
            name="block_0",
        )(xs[0])
        for i in range(1, len(xs)):
            out = UpBlock(
                self.in_channels[i],
                self.out_channels[i],
                self.kernel_sizes[i],
                self.activation,
                None,
                self.pool_size,
                name=f"block_{i}",
            )(jnp.concatenate([xs[i], out], axis=1))
        return out


class Autoencoder(nn.Module):
    in_channels: int
    enc_out_channels: Sequence[int]
    dec_out_channels: Sequence[int]
    kernel_sizes: Sequence[IntOrPair]
    activation: Optional[Callable] = None
    pool_size: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        enc_in = compute_enc_input_channels(self.in_channels, list(self.enc_out_channels))
        dec_in = compute_residual_dec_input_channels(
            list(self.enc_out_channels), list(self.dec_out_channels)
        )
        feats = Encoder(
            enc_in,
            self.enc_out_channels,
            self.kernel_sizes,
            self.activation,
            self.pool_size,
            name="encoder",
        )(x)
        return Decoder(
            dec_in,
            self.dec_out_channels,
            list(self.kernel_sizes)[::-1],
            self.activation,
            self.pool_size,
            name="decoder",
        )(feats)
