"""Channel/spatial attention zoo: CWA, attention channel pooling, CBAM.

Capability parity with the reference's elayers
(/root/reference/src/admmtor/elayers/{cwa,attentionpool,attentions}.py),
re-expressed as Flax modules on NCHW tensors. TPU notes:

* ``torch.mode`` / ``torch.median`` have no cheap JAX analog; both are
  implemented sort-based (SURVEY.md §7 hard part d). ``mode`` returns the
  most frequent value with ties broken toward the smallest — for all-unique
  float inputs this degenerates to the minimum, exactly like torch.
* ``AttentionChannelPooling``'s top-k + gather channel selection
  (attentionpool.py:27-34) maps to ``jax.lax.top_k`` +
  ``jnp.take_along_axis`` — both TPU-friendly.
"""

from __future__ import annotations

import enum
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.layers_common import (
    Conv2d,
    InstanceNorm2d,
    Linear,
    adaptive_avg_pool2d_1,
    gelu,
    identity,
)

# ---------------------------------------------------------------------------
# channel statistics (cwa.py:7-28): each maps (B, C, H, W) -> (B, C)
# ---------------------------------------------------------------------------


def _flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], x.shape[1], -1)


def amean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(_flat(x), axis=-1)


def astd(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.std(_flat(x), axis=-1, ddof=1)  # torch.std default: unbiased


def amax(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(_flat(x), axis=-1)


def amin(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(_flat(x), axis=-1)


def amedian(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median semantics: lower of the two middle elements."""
    f = jnp.sort(_flat(x), axis=-1)
    return f[..., (f.shape[-1] - 1) // 2]


def mode_from_sorted(s: jnp.ndarray) -> jnp.ndarray:
    """Mode along the last axis of an ASCENDING-sorted array (most frequent
    value; ties -> smallest; all-unique floats -> minimum, matching
    torch.mode)."""
    n = s.shape[-1]
    idx = jnp.arange(n)
    neq = jnp.concatenate(
        [jnp.ones_like(s[..., :1], dtype=bool), s[..., 1:] != s[..., :-1]], axis=-1
    )
    # index where the run containing position i starts
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(neq, idx, 0), axis=-1)
    run_len = idx - run_start + 1
    best = jnp.argmax(run_len, axis=-1, keepdims=True)
    # argmax returns the FIRST position with maximal run length; that run's
    # value is the smallest among equally frequent values (ascending sort)
    start = jnp.take_along_axis(run_start, best, axis=-1)
    return jnp.take_along_axis(s, start, axis=-1)[..., 0]


def mode_along_last(x: jnp.ndarray) -> jnp.ndarray:
    """Sort-based mode along the last axis."""
    return mode_from_sorted(jnp.sort(x, axis=-1))


def amodes(x: jnp.ndarray) -> jnp.ndarray:
    return mode_along_last(_flat(x))


class ChannelCompression(enum.Enum):
    """Enum of per-channel statistics (cwa.py:31-37)."""

    STD = ("std", astd)
    MEAN = ("mean", amean)
    MAX = ("max", amax)
    MEDIAN = ("median", amedian)
    MODE = ("mode", amodes)
    MIN = ("min", amin)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.value[1](x)


DEFAULT_COMPRESSIONS: Tuple[ChannelCompression, ...] = (
    ChannelCompression.STD,
    ChannelCompression.MEDIAN,
    ChannelCompression.MODE,
    ChannelCompression.MAX,
    ChannelCompression.MEAN,
)


class ChannelWiseAttention(nn.Module):
    """Learnable-weighted channel statistics x sigmoid 1x1-conv gate
    (cwa.py:40-91). Flags mirror the reference: ``probas_only`` returns the
    gate instead of gating, ``reduce_mean`` averages spatially,
    ``reduce_probas_space`` shrinks the bottleneck instead of expanding."""

    in_channels: int
    channel_compress_methods: Sequence[ChannelCompression] = DEFAULT_COMPRESSIONS
    probas_ch_factor: int = 2
    compress_judges_mult: int = 10  # kept for config parity (unused upstream too)
    reduce_probas_space: bool = False
    reduce_mean: bool = False
    probas_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.in_channels
        probas_space = (
            c // self.probas_ch_factor if self.reduce_probas_space else c * self.probas_ch_factor
        )
        weights = [
            self.param(f"compress_weight_{i}", nn.initializers.ones, (1,), jnp.float32)
            for i in range(len(self.channel_compress_methods))
        ]
        stats = jnp.stack(
            [m(x) * w for m, w in zip(self.channel_compress_methods, weights)], axis=-1
        )
        weighted = jnp.sum(stats, axis=-1).reshape(x.shape[0], c, 1, 1)

        h = Conv2d(c, probas_space, 1, name="conv1")(x)
        h = Conv2d(probas_space, c, 1, name="conv2")(h)
        gate = jax.nn.sigmoid(h * weighted)
        out = gate if self.probas_only else x * gate
        if self.reduce_mean:
            return out.mean(axis=(2, 3))
        return out


class AttentionChannelPooling(nn.Module):
    """Select the best ``select_channels`` feature maps per sample via CWA
    probabilities + top-k + gather (attentionpool.py:7-34)."""

    in_channels: int
    select_channels: int
    compressions: Sequence[ChannelCompression] = (
        ChannelCompression.STD,
        ChannelCompression.MEDIAN,
        ChannelCompression.MAX,
    )
    probas_channels_factor: int = 2
    reduce_probas_space: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        probs = ChannelWiseAttention(
            self.in_channels,
            self.compressions,
            self.probas_channels_factor,
            reduce_probas_space=self.reduce_probas_space,
            reduce_mean=True,
            probas_only=True,
            name="cwa",
        )(x)  # (B, C)
        _, top_idx = jax.lax.top_k(probs, self.select_channels)  # (B, k)
        idx = top_idx[:, :, None, None]
        return jnp.take_along_axis(x, idx, axis=1)


# ---------------------------------------------------------------------------
# CBAM family (attentions.py)
# ---------------------------------------------------------------------------


def logsumexp_2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, C, 1) stable logsumexp over space
    (attentions.py:6-10)."""
    flat = _flat(x)
    s = jnp.max(flat, axis=2, keepdims=True)
    return s + jnp.log(jnp.sum(jnp.exp(flat - s), axis=2, keepdims=True))


class BasicConv(nn.Module):
    """conv + InstanceNorm + GELU (attentions.py:13-35)."""

    in_planes: int
    out_planes: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_activation: bool = True
    norm: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(
            self.in_planes,
            self.out_planes,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            use_bias=self.use_bias,
            name="conv",
        )(x)
        if self.norm:
            y = InstanceNorm2d(self.out_planes, name="norm")(y)
        return gelu(y) if self.use_activation else y


def channel_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Stack per-pixel std/median/mode across channels (attentions.py:38-47
    — note the reference pools std/median/MODE, max/mean are commented out).

    Median and mode come from ONE sort of a 2D (B*H*W, C) view with the
    sort axis minor: sorting a 4D NCHW tensor along the channel axis (or
    its moveaxis'd 4D view) makes XLA:TPU pad the sort operand ~44x
    (measured 2.69 GB of padding per 64.5 MB operand at flagship training
    shapes, an instant HBM OOM); the 2D minor-axis sort pads only
    C -> lanes (86 -> 128, 1.5x)."""
    b, c, h, w = x.shape
    s = jnp.sort(jnp.moveaxis(x, 1, -1).reshape(-1, c), axis=-1)
    med = s[:, (c - 1) // 2].reshape(b, h, w)
    mode = mode_from_sorted(s).reshape(b, h, w)
    std = jnp.std(x, axis=1, ddof=1)
    return jnp.stack([std, med, mode], axis=1)


class ChannelPool(nn.Module):
    """Module form of :func:`channel_pool` (reference ``ChannelPool``,
    attentions.py:38-47) — stateless, provided for API parity."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return channel_pool(x)


class SpatialGate(nn.Module):
    """x * sigmoid(conv(channel_pool(x))) (attentions.py:50-60)."""

    kernel_size: int = 7
    use_activation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = channel_pool(x)
        gate = BasicConv(
            3,
            1,
            self.kernel_size,
            stride=1,
            padding=(self.kernel_size - 1) // 2,
            use_activation=self.use_activation,
            name="spatial",
        )(pooled)
        return x * jax.nn.sigmoid(gate)


class ChannelGate(nn.Module):
    """Pooled-MLP channel gate with avg/max/lp/lse pool types
    (attentions.py:63-95)."""

    gate_channels: int
    reduction_ratio: int = 16
    pool_types: Tuple[str, ...] = ("avg", "max")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mlp = [
            Linear(self.gate_channels, self.gate_channels // self.reduction_ratio, name="fc1"),
            Linear(self.gate_channels // self.reduction_ratio, self.gate_channels, name="fc2"),
        ]

        def run_mlp(v: jnp.ndarray) -> jnp.ndarray:
            h = mlp[0](v.reshape(v.shape[0], -1))
            return mlp[1](gelu(h))

        att_sum = None
        for pool_type in self.pool_types:
            # the reference pools over the FULL plane (attentions.py:70-77);
            # express that as a plain reduction, not a windowed reduce: the
            # backward of a plane-sized reduce_window max is a
            # select_and_scatter whose VMEM operand exceeds the chip limit
            # at flagship shapes (3x86x256x256), while reduce-max/mean
            # differentiate through cheap masks/broadcasts
            if pool_type == "avg":
                pooled = jnp.mean(x, axis=(2, 3), keepdims=True)
            elif pool_type == "max":
                pooled = jnp.max(x, axis=(2, 3), keepdims=True)
            elif pool_type == "lp":
                # torch lp_pool2d(norm_type=2): (sum x^2)^(1/2) over the window
                pooled = jnp.sqrt(jnp.sum(x**2, axis=(2, 3), keepdims=True))
            elif pool_type == "lse":
                pooled = logsumexp_2d(x)
            else:  # pragma: no cover
                raise ValueError(pool_type)
            att = run_mlp(pooled)
            att_sum = att if att_sum is None else att_sum + att
        gate = jax.nn.sigmoid(att_sum)[:, :, None, None]
        return x * gate


class CBAM(nn.Module):
    """Channel gate (+ optional spatial gate) (attentions.py:98-111)."""

    gate_channels: int
    reduction_ratio: int = 16
    pool_types: Tuple[str, ...] = ("avg", "max")
    use_spatial: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = ChannelGate(
            self.gate_channels, self.reduction_ratio, self.pool_types, name="channel_gate"
        )(x)
        if self.use_spatial:
            y = SpatialGate(name="spatial_gate")(y)
        return y
