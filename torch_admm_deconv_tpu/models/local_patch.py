"""Patch-local attention: route each spatial patch through its own gate.

Capability parity with
/root/reference/src/admmtor/elayers/local_attention_patch.py: unfold the
image into patches, apply a per-patch learnable residual gating block
(``PatchProcessor``), fold back with overlap-add. The reference's torch Lazy
modules materialize on first call; Flax ``nn.compact`` gives the same
shape-inferred behaviour natively. Validation rules match (positive sizes,
``num_patches == num_processors``, local_attention_patch.py:131-134).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.layers_common import (
    Conv2d,
    ConvTranspose2d,
    Linear,
    fold,
    unfold,
)

IntOrPair = Union[int, Tuple[int, int]]


class Conv1d(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, C, L)."""
        fan_in = self.in_channels * self.kernel_size
        bound = math.sqrt(6.0 / (6.0 * fan_in))

        def init_w(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("kernel", init_w, (self.out_channels, self.in_channels, self.kernel_size))
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)[None, :, None]
        return y


class PatchProcessor(nn.Module):
    """Learnable residual gate on one patch (local_attention_patch.py:10-63)."""

    channels: int
    features_multiplier: int = 1
    downscale_kernel: IntOrPair = 1
    downscale_stride: IntOrPair = 1

    def _validate(self):
        for name, v in (("downscale_kernel", self.downscale_kernel), ("downscale_stride", self.downscale_stride)):
            vals = v if isinstance(v, tuple) else (v,)
            if any(k <= 0 for k in vals):
                raise ValueError(f"{name} entries must be positive")

    @nn.compact
    def __call__(self, patch: jnp.ndarray) -> jnp.ndarray:
        self._validate()
        b, c, h, w = patch.shape
        fm = self.features_multiplier
        processed = Conv2d(
            c,
            self.channels,
            self.downscale_kernel,
            stride=self.downscale_stride,
            name="downscale",
        )(patch)
        flat = processed.reshape(b, -1)
        gated = Linear(flat.shape[-1], self.channels * fm, name="linear")(flat)
        gated = gated.reshape(b, -1, fm)
        gated = Conv1d(gated.shape[1], self.channels, fm, name="conv1d_a_1")(gated)
        gated = Conv1d(self.channels, self.channels, 1, name="conv1d_a_2")(gated)
        gate = jax.nn.sigmoid(gated).reshape(b, self.channels, 1, 1)

        res = ConvTranspose2d(c, self.channels, 5, name="conv2d_b_1")(patch)
        res = Conv2d(self.channels, self.channels, 1, name="conv2d_b_2")(res)
        res = Conv2d(self.channels, self.channels, 5, name="conv2d_b_3")(res)
        return patch + res * jnp.broadcast_to(gate, (b, self.channels, h, w))


class LocalAttentionPatch(nn.Module):
    """Unfold -> per-patch processors -> fold (local_attention_patch.py:66-150)."""

    patch_size: int
    stride: int
    num_processors: int
    channels: Optional[int] = None
    features_multiplier: int = 1
    downscale_kernel: IntOrPair = 1
    downscale_stride: IntOrPair = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.patch_size <= 0:
            raise ValueError("patch_size must be a positive integer")
        if self.stride <= 0:
            raise ValueError("stride must be a positive integer")
        if self.num_processors <= 0:
            raise ValueError("num_processors must be a positive integer")
        if self.features_multiplier <= 0:
            raise ValueError("features_multiplier must be a positive integer")
        if x.ndim != 4:
            raise ValueError("LocalAttentionPatch expects input with shape (B, C, H, W)")
        b, c, h, w = x.shape
        if self.channels is not None and c != self.channels:
            raise ValueError(f"Expected {self.channels} input channels, received {c}")

        patches = unfold(x, self.patch_size, self.stride)  # (B, C*k*k, L)
        num_patches = patches.shape[-1]
        if num_patches == 0:
            raise ValueError("No patches were extracted; check patch size and stride")
        if num_patches != self.num_processors:
            raise ValueError(
                f"Expected num processors to be same as {num_patches} patches, "
                f"but got {self.num_processors}"
            )
        per_patch = patches.reshape(b, c, self.patch_size, self.patch_size, num_patches)

        processed = [
            PatchProcessor(
                c,
                self.features_multiplier,
                downscale_kernel=self.downscale_kernel,
                downscale_stride=self.downscale_stride,
                name=f"processor_{i}",
            )(per_patch[..., i])
            for i in range(num_patches)
        ]
        stacked = jnp.stack(processed, axis=-1).reshape(b, -1, num_patches)
        return fold(stacked, (h, w), self.patch_size, self.stride)
