"""ParallelUpsampleReduce: bicubic upsample -> parallel strided convs ->
1x1 fuse.

Capability parity with /root/reference/src/admmtor/elayers/sra.py:8-71,
including the validation rules (odd branch kernels, integer scale).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.layers_common import Conv2d, interpolate_bicubic


class ParallelUpsampleReduce(nn.Module):
    in_channels: int
    scale_factor: int
    num_branches: int
    branch_kernel_size: Union[int, Sequence[int]]
    branch_channels: Optional[int] = None
    branch_bias: bool = True
    final_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = self.branch_kernel_size
        if isinstance(ks, int):
            ks = [ks] * self.num_branches
        elif len(ks) != self.num_branches:
            raise ValueError("branch_kernel_size must be an int or a list of length num_branches")
        if self.scale_factor < 1 or int(self.scale_factor) != self.scale_factor:
            raise ValueError("scale_factor must be a positive integer")
        if self.num_branches < 1:
            raise ValueError("num_branches must be >= 1")
        if any(k % 2 == 0 for k in ks):
            raise ValueError(
                f"branch_kernel_size must be odd to preserve alignment but got {ks}"
            )
        branch_channels = self.branch_channels or self.in_channels

        up = interpolate_bicubic(x, int(self.scale_factor))
        feats = [
            Conv2d(
                self.in_channels,
                branch_channels,
                k,
                stride=int(self.scale_factor),
                padding=k // 2,
                use_bias=self.branch_bias,
                name=f"branch_{i}",
            )(up)
            for i, k in enumerate(ks)
        ]
        fused = jnp.concatenate(feats, axis=1)
        out = Conv2d(
            branch_channels * self.num_branches,
            self.in_channels,
            1,
            use_bias=self.final_bias,
            name="final_conv",
        )(fused)
        return self.activation(out) if self.activation else out
