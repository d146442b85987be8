"""DivergentRestorer — the flagship trained restoration model.

Capability parity with /root/reference/src/admmtor/modelbuild/denoiser.py:
N levels of ``DivergentAttention`` (per-level branch counts, e.g. [2, 8, 32])
with ``ChannelWiseAttention`` gates between levels and the network input
re-concatenated at every level; ADMM deconv front-ends only in level 0
(denoiser.py:28-35). The level ordering quirk is preserved: intermediate
levels apply block-then-gate, the final level applies gate-then-block
(denoiser.py:53-63).

Training config parity: scripts/train.py:70-73 instantiates
DivergentRestorer([2, 8, 32], 3, 3, 86, 86, 8, output_activation=sigmoid,
admms=[two kernel-less 100-iter iso ADMM configs]).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.attention import ChannelWiseAttention
from torch_admm_deconv_tpu.models.blocks import DivergentAttention

# the two kernel-less 100-iteration isotropic ADMM configs hardcoded in
# scripts/train.py:19-24
DECONV1 = {"kern_size": (), "max_iters": 100, "iso": True}
DECONV2 = {"kern_size": (), "max_iters": 100, "iso": True}


class DivergentRestorer(nn.Module):
    level_branches: Sequence[int]
    in_channels: int
    final_channels: int
    filters: int
    gate_channels: int
    attention_reduction: int
    intermediate_activation: Optional[Callable] = None
    output_activation: Optional[Callable] = None
    admms: Optional[Sequence[dict]] = None
    # rematerialize whole levels (and each branch's attention internals) in
    # the backward pass — required to train the flagship [2,8,32] config at
    # 256^2 within 16 GB HBM; numerics unchanged
    remat_levels: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.level_branches)
        da_cls = nn.remat(DivergentAttention) if self.remat_levels else DivergentAttention
        blocks = []
        scas = []
        for i in range(n):
            scas.append(ChannelWiseAttention(self.filters, name=f"sca_{i}"))
            if i == 0:
                blocks.append(
                    da_cls(
                        branches=self.level_branches[i],
                        in_channels=self.in_channels,
                        out_channels=self.filters,
                        conv_filters=self.filters,
                        gate_channels=self.gate_channels,
                        attention_reduction=self.attention_reduction,
                        out_activation=self.intermediate_activation,
                        admms=self.admms,
                        remat_branches=self.remat_levels,
                        name=f"block_{i}",
                    )
                )
            elif i == n - 1:
                blocks.append(
                    da_cls(
                        branches=self.level_branches[i],
                        in_channels=self.filters + self.in_channels,
                        out_channels=self.final_channels,
                        conv_filters=self.filters,
                        gate_channels=self.gate_channels,
                        attention_reduction=self.attention_reduction,
                        out_activation=self.output_activation,
                        remat_branches=self.remat_levels,
                        name=f"block_{i}",
                    )
                )
            else:
                blocks.append(
                    da_cls(
                        branches=self.level_branches[i],
                        in_channels=self.filters + self.in_channels,
                        out_channels=self.filters,
                        conv_filters=self.filters,
                        gate_channels=self.gate_channels,
                        attention_reduction=self.attention_reduction,
                        out_activation=self.intermediate_activation,
                        remat_branches=self.remat_levels,
                        name=f"block_{i}",
                    )
                )

        out = blocks[0](x)
        out = scas[0](out)
        for i in range(1, n):
            if i < n - 1:
                out = blocks[i](jnp.concatenate([out, x], axis=1))
                out = scas[i](out)
            else:
                out = scas[i](out)
                out = blocks[i](jnp.concatenate([out, x], axis=1))
        return out


def flagship_divergent_restorer(
    output_activation: Callable = nn.sigmoid,
    max_iters: int = 100,
    remat: bool = True,
    use_pallas: bool = False,
    gradient_mode: str = "unroll",
) -> DivergentRestorer:
    """The exact training configuration of scripts/train.py:70-73.

    ``use_pallas=True`` routes the (empty-kernel) ADMM layers through the
    whole-solve-in-VMEM Pallas kernel — inference only (not differentiable);
    pair it with ``remat=False``. ``gradient_mode="implicit"`` trains the
    ADMM layers through the converged fixed point (IFT adjoint,
    ops/implicit.py) instead of unrolling all ``max_iters`` iterations
    through autograd (the reference's only mode, eops/deconv.py:103-115).
    """
    admm = {
        "kern_size": (),
        "max_iters": max_iters,
        "iso": True,
        "remat": remat,
        "use_pallas": use_pallas,
        "gradient_mode": gradient_mode,
    }
    return DivergentRestorer(
        level_branches=[2, 8, 32],
        in_channels=3,
        final_channels=3,
        filters=86,
        gate_channels=86,
        attention_reduction=8,
        output_activation=output_activation,
        admms=[dict(admm), dict(admm)],
        remat_levels=remat,
    )
