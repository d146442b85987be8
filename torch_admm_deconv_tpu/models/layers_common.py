"""NCHW building-block layers (Flax linen) shared across the model zoo.

The reference is a torch codebase, so every tensor contract in SURVEY.md is
NCHW with torch-style conv semantics. These thin linen wrappers keep that
contract (XLA lays out NCHW convs fine on TPU) and reproduce the reference's
initializer choices (xavier for convs, zero bias) so trained-parameter
statistics are comparable.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def xavier_uniform_conv(key, shape, dtype=jnp.float32):
    """torch-style xavier uniform for OIHW conv kernels: fans use
    in/out channels x receptive field."""
    o, i, kh, kw = shape
    fan_in, fan_out = i * kh * kw, o * kh * kw
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def xavier_normal_conv(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_normal_ for OIHW kernels (blocks.py:345-352)."""
    o, i, kh, kw = shape
    fan_in, fan_out = i * kh * kw, o * kh * kw
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


#: Exact-name alias for the reference's ``default_init_weights``
#: (blocks.py:345-352 — xavier-normal over conv kernels). In the functional
#: JAX design this is a flax ``kernel_init`` rather than an in-place mutator.
default_init_weights = xavier_normal_conv


def kaiming_uniform_conv(key, shape, dtype=jnp.float32):
    """torch Conv2d default init: kaiming uniform with a=sqrt(5)."""
    o, i, kh, kw = shape
    fan_in = i * kh * kw
    bound = math.sqrt(6.0 / ((1 + 5.0) * fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv2d(nn.Module):
    """torch-semantics 2D conv on NCHW input, OIHW kernel."""

    in_channels: int
    out_channels: int
    kernel_size: IntOrPair
    stride: IntOrPair = 1
    padding: IntOrPair = 0
    dilation: IntOrPair = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = kaiming_uniform_conv
    pad_mode: str = "zeros"  # zeros | reflect | circular

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        w = self.param(
            "kernel",
            self.kernel_init,
            (self.out_channels, self.in_channels // self.groups, kh, kw),
        )
        if self.pad_mode != "zeros" and (ph or pw):
            mode = {"reflect": "reflect", "circular": "wrap"}[self.pad_mode]
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode=mode)
            pad = ((0, 0), (0, 0))
        else:
            pad = ((ph, ph), (pw, pw))
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=_pair(self.stride),
            padding=pad,
            rhs_dilation=_pair(self.dilation),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)[None, :, None, None]
        return y


class ConvTranspose2d(nn.Module):
    """torch-semantics transposed conv (stride-1 'full' when padding=0)."""

    in_channels: int
    out_channels: int
    kernel_size: IntOrPair
    stride: IntOrPair = 1
    padding: IntOrPair = 0
    use_bias: bool = True
    kernel_init: Callable = kaiming_uniform_conv

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        # torch ConvTranspose2d(IOHW) == lhs-dilated conv with flipped kernel
        w = self.param(
            "kernel",
            self.kernel_init,
            (self.out_channels, self.in_channels, kh, kw),
        )
        wf = jnp.flip(w, axis=(-2, -1)).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            wf,
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)[None, :, None, None]
        return y


class Linear(nn.Module):
    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bound = 1.0 / math.sqrt(self.in_features)

        def init_w(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("kernel", init_w, (self.in_features, self.out_features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", init_w, (self.out_features,))
            y = y + b.astype(y.dtype)
        return y


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel spatial normalization (affine), NCHW.

    Mirrors torch nn.InstanceNorm2d(affine=True) as used by the reference's
    BasicConv (attentions.py:29).
    """

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.var(x, axis=(-2, -1), keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        w = self.param("scale", nn.initializers.ones, (self.num_features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.num_features,), jnp.float32)
        return y * w[None, :, None, None] + b[None, :, None, None]


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NCHW, matching the reference's custom-autograd
    LayerNorm2d (blocks.py:118-155). JAX derives the same backward the
    reference hand-writes, so no custom VJP is needed."""

    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (self.channels,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        return y * w[None, :, None, None] + b[None, :, None, None]


def same_padding(x: jnp.ndarray, kernel_size: IntOrPair) -> jnp.ndarray:
    """Reflect-pad NCHW input so a valid conv keeps spatial dims
    (blocks.py:10-23; assumes odd kernels like the reference)."""
    kh, kw = _pair(kernel_size)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    return jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode="reflect")


def max_pool2d(x: jnp.ndarray, kernel: IntOrPair, stride: Optional[IntOrPair] = None) -> jnp.ndarray:
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 1, kh, kw),
        (1, 1, sh, sw),
        "VALID",
    )


def avg_pool2d(x: jnp.ndarray, kernel: IntOrPair, stride: Optional[IntOrPair] = None) -> jnp.ndarray:
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, 1, kh, kw),
        (1, 1, sh, sw),
        "VALID",
    )
    return summed / (kh * kw)


def adaptive_avg_pool2d_1(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pool to (B, C, 1, 1)."""
    return jnp.mean(x, axis=(-2, -1), keepdims=True)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch nn.PixelShuffle on NCHW."""
    b, c, h, w = x.shape
    oc = c // (r * r)
    x = x.reshape(b, oc, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, oc, h * r, w * r)


def interpolate_bicubic(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bicubic upsample on NCHW (align_corners semantics approximated by
    jax.image.resize's cubic kernel)."""
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, h * scale, w * scale), method="cubic")


def unfold(x: jnp.ndarray, kernel: IntOrPair, stride: IntOrPair) -> jnp.ndarray:
    """torch F.unfold: NCHW -> (B, C*kh*kw, L) patch matrix."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    b, c, h, w = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kh, kw),
        window_strides=(sh, sw),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (B, C*kh*kw, oh, ow)
    _, ckk, oh, ow = patches.shape
    return patches.reshape(b, ckk, oh * ow)


def fold(patches: jnp.ndarray, output_size: Tuple[int, int], kernel: IntOrPair, stride: IntOrPair) -> jnp.ndarray:
    """torch F.fold: (B, C*kh*kw, L) -> NCHW with overlap-add."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride)
    h, w = output_size
    b, ckk, L = patches.shape
    c = ckk // (kh * kw)
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    p = patches.reshape(b, c, kh, kw, oh, ow)
    out = jnp.zeros((b, c, h, w), patches.dtype)
    for i in range(kh):
        for j in range(kw):
            out = out.at[:, :, i : i + oh * sh : sh, j : j + ow * sw : sw].add(p[:, :, i, j])
    return out


class Sequential(nn.Module):
    layers: Sequence[Callable]

    @nn.compact
    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def identity(x):
    return x
