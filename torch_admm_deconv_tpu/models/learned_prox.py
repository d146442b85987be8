"""Unrolled ADMM with a learned proximal z-update (plug-and-play style).

Beyond-reference capability (BASELINE.json config 4 / north star: "z-update
prox (TV soft-threshold / learned prox net)"): the reference's learned ADMM
only makes lambda/rho/PSF learnable around the fixed TV shrinkage
(admmdeconv.py); here the shrinkage itself is a small residual CNN applied
to the joint (d + u) gradient pair, initialized to act near-identity so
early training behaves like classical ADMM. The x-update stays the exact
circulant frequency solve (differentiable matmul-DFT/FFT), weights are
shared across the unrolled stages (standard PnP practice), and rho/lambda
remain learnable scalars.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.layers_common import Conv2d
from torch_admm_deconv_tpu.ops import fdops
from torch_admm_deconv_tpu.ops.prox import soft_thresh
from torch_admm_deconv_tpu.ops.solver import _htran, _x_update


class ProxNet(nn.Module):
    """Small residual CNN prox: (B, 2C, H, W) joint gradient pair -> same."""

    channels: int
    hidden: int = 32
    depth: int = 3

    @nn.compact
    def __call__(self, v: jnp.ndarray, tau) -> jnp.ndarray:
        c2 = 2 * self.channels
        # classical shrinkage as the base point
        base = soft_thresh(v, tau)
        h = jnp.concatenate([v, base], axis=1)
        h = Conv2d(2 * c2, self.hidden, 3, padding=1, name="conv_in")(h)
        h = jax.nn.gelu(h)
        for i in range(self.depth - 2):
            h = Conv2d(self.hidden, self.hidden, 3, padding=1, name=f"conv_{i}")(h)
            h = jax.nn.gelu(h)
        delta = Conv2d(
            self.hidden,
            c2,
            3,
            padding=1,
            name="conv_out",
            kernel_init=nn.initializers.zeros,  # start exactly at soft-threshold
        )(h)
        return base + delta


class LearnedProxADMM(nn.Module):
    """Unrolled ADMM deconvolution with shared learned prox.

    ``kern_size`` empty => denoising mode (H = I), like ADMMDeconv.
    """

    steps: int = 10
    channels: int = 3
    kern_size: Tuple[int, ...] = ()
    hidden: int = 32
    remat: bool = True
    # Non-blind mode: the true PSF as a flattened (hashable) tuple of floats
    # of prod(kern_size) entries. When set, H is this fixed operator and the
    # net learns only the prox (+ lambda/rho); when None with a non-empty
    # kern_size, the PSF is a learnable Xavier-init parameter exactly like
    # ADMMDeconv (reference admmdeconv.py:30-41).
    psf_fixed: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, xin: jnp.ndarray) -> jnp.ndarray:
        dtype = xin.dtype
        im_shape = xin.shape[-2:]
        lmbd = self.param("lmbda", nn.initializers.constant(0.05), (1,), jnp.float32)
        rho = self.param("rho", nn.initializers.constant(1.0), (1,), jnp.float32)
        lmbd_s = jnp.reshape(jnp.abs(lmbd), ()) + 1e-8
        rho_s = jnp.reshape(jnp.abs(rho), ()) + 1e-8
        tau = lmbd_s / rho_s

        if self.psf_fixed is not None:
            assert self.kern_size, "psf_fixed requires kern_size"
            kern = jnp.asarray(self.psf_fixed, jnp.float32).reshape(1, 1, *self.kern_size)
        elif self.kern_size:
            from torch_admm_deconv_tpu.models.layers_common import xavier_uniform_conv

            kern = self.param("w", xavier_uniform_conv, (1, 1, *self.kern_size))
        else:
            kern = None

        freq_c = fdops.freq_denominator(im_shape, rho_s, kern, dtype)
        hty = _htran(xin, kern, im_shape, dtype)

        prox_cls = nn.remat(ProxNet) if self.remat else ProxNet
        prox = prox_cls(self.channels, self.hidden, name="prox")

        def stage(x_state):
            s, u = x_state
            x = _x_update(s, freq_c, im_shape)
            d = jnp.concatenate([fdops.dx(x), fdops.dy(x)], axis=1)
            z = prox(d + u, tau)
            u = u + d - z
            t = z - u
            c = self.channels
            s = hty + rho_s * (fdops.dx_t(t[:, :c]) + fdops.dy_t(t[:, c:]))
            return (s, u), x

        state = (hty, jnp.concatenate([jnp.zeros_like(xin)] * 2, axis=1))
        x = jnp.zeros_like(xin)
        for _ in range(self.steps):
            state, x = stage(state)
        return x


def default_learned_prox(
    kern: int = 0,
    steps: int = 10,
    hidden: int = 32,
    psf: Optional[jnp.ndarray] = None,
) -> LearnedProxADMM:
    """The one shared construction for the train and eval CLIs.

    Round-4 advisor finding: steps/channels/hidden were hardcoded
    independently in scripts/train.py and scripts/eval_algs.py, so a drift on
    either side produced an opaque param-tree mismatch at checkpoint load.
    ``kern``: 0 => denoising mode (empty kernel); N => (1,1,N,N) PSF — fixed
    to ``psf`` when given (non-blind, BASELINE config 4), learnable
    Xavier-init otherwise (ADMMDeconv parity)."""
    import numpy as _np

    kern_size = (kern, kern) if kern else ()
    psf_fixed = None
    if psf is not None:
        assert kern, "psf requires kern > 0"
        psf_fixed = tuple(float(v) for v in _np.asarray(psf).reshape(-1))
        assert len(psf_fixed) == kern * kern
    return LearnedProxADMM(
        steps=steps, channels=3, kern_size=kern_size, hidden=hidden, psf_fixed=psf_fixed
    )
