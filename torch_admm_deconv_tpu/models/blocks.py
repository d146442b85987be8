"""Composite blocks for the restoration models.

Capability parity with /root/reference/src/admmtor/modelbuild/blocks.py,
including the flagship ``DivergentAttention`` with its documented quirks
(SURVEY.md §2.3):

* the conv list interleaves a 1x1 conv and an ``UpDownBlock`` per branch
  (blocks.py:181-184); with ADMM front-ends only the first ``branches``
  entries are consumed (the zip at blocks.py:196 truncates);
* CBAM pool types alternate ('avg','max') / ('lp','lse') per branch
  (blocks.py:173, 186);
* the two attention halves combine as cat(a*b, a+b) -> 1x1 conv out
  (blocks.py:199-204). Branch counts must be even (odd counts crash the
  reference too).

Reference defects fixed rather than copied (SURVEY.md known defects):
``DepthwiseDownBlock`` (broken init-arity call at blocks.py:333) is
implemented working; channel-wiring helpers are kept for the autoencoder.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.admm_deconv import ADMMDeconv
from torch_admm_deconv_tpu.models.attention import CBAM, AttentionChannelPooling
from torch_admm_deconv_tpu.models.layers_common import (
    Conv2d,
    ConvTranspose2d,
    IntOrPair,
    max_pool2d,
    same_padding,
    xavier_normal_conv,
)

# ---------------------------------------------------------------------------
# channel-wiring helpers (blocks.py:26-48)
# ---------------------------------------------------------------------------


def compute_residual_dec_input_channels(
    enc_out_channels: List[int], dec_out_channels: List[int]
) -> List[int]:
    rev = enc_out_channels[::-1]
    return [rev[0]] + [e + d for e, d in zip(rev[1:], dec_out_channels[:-1])]


def compute_enc_input_channels(in_channels: int, enc_out_channels: List[int]) -> List[int]:
    return [in_channels] + enc_out_channels[:-1]


def compute_depth_enc_in_out_channels(
    in_channels: int, enc_out_channels: List[int]
) -> Tuple[List[int], List[int]]:
    res = [in_channels]
    for i, k in enumerate(enc_out_channels):
        res.append(k * res[i])
    return res[:-1], res[1:]


def conv2d_pooling_output_shape(
    input_shape,
    kernel_size,
    stride=1,
    padding=0,
    dilation=1,
    pooling_size=None,
    pooling_stride=None,
    pooling_padding=0,
) -> Tuple[int, int]:
    """Conv (+ optional pool) output-shape calculator (blocks.py:50-115)."""
    pair = lambda v: (v, v) if isinstance(v, int) else tuple(v)  # noqa: E731
    (kh, kw), (sh, sw) = pair(kernel_size), pair(stride)
    (ph, pw), (dh, dw) = pair(padding), pair(dilation)
    h, w = input_shape
    oh = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    ow = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    if pooling_size is not None:
        pkh, pkw = pair(pooling_size)
        psh, psw = pair(pooling_stride if pooling_stride is not None else pooling_size)
        pph, ppw = pair(pooling_padding)
        oh = (oh + 2 * pph - pkh) // psh + 1
        ow = (ow + 2 * ppw - pkw) // psw + 1
    return oh, ow


# ---------------------------------------------------------------------------
# basic up/down blocks (blocks.py:207-342)
# ---------------------------------------------------------------------------


class DownBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: IntOrPair
    activation: Optional[Callable] = None
    normalization: Optional[Callable] = None
    pool_size: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv2d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            padding=max(0, self.pool_size - 1),
            use_bias=False,
            kernel_init=xavier_normal_conv,
            name="down_conv",
        )(x)
        if self.normalization is not None:
            x = self.normalization(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.pool_size:
            x = max_pool2d(x, self.pool_size, 1)
        return x


class UpBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: IntOrPair
    activation: Optional[Callable] = None
    normalization: Optional[Callable] = None
    pool_size: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvTranspose2d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            use_bias=False,
            kernel_init=xavier_normal_conv,
            name="up_conv",
        )(x)
        if self.normalization is not None:
            x = self.normalization(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.pool_size:
            x = max_pool2d(x, self.pool_size, 1)
        return x


class DepthwiseDownBlock(nn.Module):
    """Depthwise conv block — implemented working (the reference version
    crashes on a wrong-arity init call, blocks.py:333 vs 345)."""

    in_channels: int
    out_channels: int
    kernel_size: IntOrPair
    activation: Optional[Callable] = None
    pool_size: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv2d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            padding=max(0, self.pool_size - 1),
            groups=self.in_channels,
            use_bias=self.use_bias,
            kernel_init=xavier_normal_conv,
            name="depth_conv",
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.pool_size:
            x = max_pool2d(x, self.pool_size, 1)
        return x


class UpDownBlock(nn.Module):
    """ConvTranspose up -> 1x1 -> conv down with 1x1 residual
    (blocks.py:207-230)."""

    up_in_ch: int
    up_out_ch: int
    down_out_ch: int
    kernel_size: IntOrPair
    activation: Optional[Callable] = None
    normalization: Optional[Callable] = None
    pool_size: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = Conv2d(self.up_in_ch, self.down_out_ch, 1, use_bias=True, name="chx")(x)
        y = UpBlock(
            self.up_in_ch,
            self.up_out_ch,
            self.kernel_size,
            self.activation,
            self.normalization,
            self.pool_size,
            name="up_block",
        )(x)
        y = Conv2d(self.up_out_ch, self.up_out_ch, 1, use_bias=False, name="chc")(y)
        y = DownBlock(
            self.up_out_ch,
            self.down_out_ch,
            self.kernel_size,
            self.activation,
            self.normalization,
            self.pool_size,
            name="down_block",
        )(y)
        y = Conv2d(self.down_out_ch, self.down_out_ch, 1, use_bias=False, name="chc2")(y)
        return res + y


class MultiScaleConvPool(nn.Module):
    """Parallel convs at multiple kernel sizes + attention channel pooling
    (blocks.py:233-249)."""

    in_channels: int
    out_channels: int
    filters: int
    ks: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = [
            Conv2d(self.in_channels, self.filters, k, use_bias=True, name=f"conv_{i}")(
                same_padding(x, k)
            )
            for i, k in enumerate(self.ks)
        ]
        y = jnp.concatenate(feats, axis=1)
        return AttentionChannelPooling(
            self.filters * len(self.ks), self.out_channels, name="cwa_pool"
        )(y)


class MultiADMM(nn.Module):
    """Channel-concat of N ADMMDeconv layers (blocks.py:252-261)."""

    admm_dicts: Sequence[dict]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(
            [ADMMDeconv(**cfg, name=f"admm_{i}")(x) for i, cfg in enumerate(self.admm_dicts)],
            axis=1,
        )


# ---------------------------------------------------------------------------
# DivergentAttention (blocks.py:158-204)
# ---------------------------------------------------------------------------

_POOL_TYPES = (("avg", "max"), ("lp", "lse"))


class DivergentAttention(nn.Module):
    branches: int
    in_channels: int
    out_channels: int
    conv_filters: int
    gate_channels: int
    attention_reduction: int
    out_activation: Optional[Callable] = None
    admms: Optional[Sequence[dict]] = None
    # rematerialize each branch's CBAM/UpDownBlock internals in the backward
    # pass — at flagship training shapes (32 branches x (B,86,256,256)
    # features) storing every branch's gate/pool intermediates exceeds the
    # 16 GB chip HBM; recomputing them trades ~1 extra forward of the branch
    # for O(branches) fewer live activations. Identical numerics.
    remat_branches: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.admms is not None:
            assert len(self.admms) == self.branches
        cbam_cls = nn.remat(CBAM) if self.remat_branches else CBAM
        udb_cls = nn.remat(UpDownBlock) if self.remat_branches else UpDownBlock
        convs: List[nn.Module] = []
        for i in range(self.branches):
            convs.append(
                Conv2d(
                    self.in_channels,
                    self.conv_filters,
                    1,
                    use_bias=True,
                    kernel_init=xavier_normal_conv,
                    name=f"conv_{2 * i}",
                )
            )
            convs.append(
                udb_cls(
                    up_in_ch=self.in_channels,
                    up_out_ch=self.in_channels,
                    down_out_ch=self.conv_filters,
                    kernel_size=3,
                    name=f"conv_{2 * i + 1}",
                )
            )
        attentions = [
            cbam_cls(
                gate_channels=self.gate_channels,
                reduction_ratio=self.attention_reduction,
                pool_types=_POOL_TYPES[i % 2],
                use_spatial=True,
                name=f"cbam_{i}",
            )
            for i in range(self.branches)
        ]

        if self.admms is not None:
            # reference quirk: zip truncates the 2*branches conv list to the
            # first `branches` entries (blocks.py:196)
            admm_layers = [
                ADMMDeconv(**cfg, name=f"admm_{i}") for i, cfg in enumerate(self.admms)
            ]
            outs = [conv(admm(x)) for conv, admm in zip(convs, admm_layers)]
        else:
            outs = [conv(x) for conv in convs]

        half_a = [
            att(feat) + feat
            for att, feat in zip(attentions[: len(attentions) // 2], outs[: len(outs) // 2])
        ]
        half_b = [
            att(feat) + feat
            for att, feat in zip(attentions[len(attentions) // 2 :], outs[len(outs) // 2 :])
        ]
        outs_a = jnp.concatenate(half_a, axis=1)
        outs_b = jnp.concatenate(half_b, axis=1)
        combined = jnp.concatenate([outs_a * outs_b, outs_a + outs_b], axis=1)
        y = Conv2d(
            self.conv_filters * self.branches,
            self.out_channels,
            1,
            use_bias=True,
            kernel_init=xavier_normal_conv,
            name="convout",
        )(combined)
        return self.out_activation(y) if self.out_activation is not None else y
