"""Differentiable unrolled-ADMM layer with learnable PSF / lambda / rho / bias.

Capability parity with the reference ``ADMMDeconv``
(/root/reference/src/admmtor/elayers/admmdeconv.py:6-64), including its
"falsy => learnable" contract:

* ``lmbda``/``rho`` = None (or 0 — reference quirk at admmdeconv.py:27,36)
  creates a learnable scalar initialized U(0, 1); any other value is a fixed
  constant.
* non-empty ``kern_size`` creates a learnable (1, 1, kh, kw) PSF with
  xavier-uniform init (admmdeconv.py:44-48); empty means pure TV denoising.
* ``bias=True`` adds a learnable scalar bias init U(0, 1).
* forward = activation(admm_tv(x, lmbda, rho, w, iso, max_iters) + b)
  (admmdeconv.py:63-64).

Training unrolls all ``max_iters`` iterations through the ``lax.scan``
autodiff; set ``remat=True`` to rematerialize iterations (memory vs FLOPs
for the reference's 100-iteration configs). Alternatively set
``gradient_mode="implicit"`` to train through the converged fixed point
(``ops/implicit.py``): the forward solve is residual-stopped and the VJP is
the implicit-function-theorem adjoint — O(1) memory in iteration count,
``max_iters`` becomes a cap rather than an exact unroll length.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torch_admm_deconv_tpu.models.layers_common import identity, xavier_uniform_conv
from torch_admm_deconv_tpu.ops.solver import admm_tv


def _uniform01(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, 0.0, 1.0)


class ADMMDeconv(nn.Module):
    kern_size: Tuple[int, ...] = ()
    max_iters: int = 100
    lmbda: Optional[float] = None
    rho: Optional[float] = None
    iso: bool = True
    bias: bool = False
    activation: Callable = identity
    # TPU-native extras (defaults preserve reference behaviour)
    iso_mode: str = "compat"
    remat: bool = False
    use_pallas: bool = False
    gradient_mode: str = "unroll"  # "unroll" (reference parity) | "implicit"
    implicit_tol: float = 1e-6
    implicit_backward_iters: int = 50

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.lmbda:  # falsy => learnable (reference contract)
            lmbd = self.param("lmbda", _uniform01, (1,))
        else:
            lmbd = jnp.asarray(self.lmbda, x.dtype)
        if not self.rho:
            rho = self.param("rho", _uniform01, (1,))
        else:
            rho = jnp.asarray(self.rho, x.dtype)
        if self.kern_size:
            w = self.param("w", xavier_uniform_conv, (1, 1, *self.kern_size))
        else:
            w = None
        if self.gradient_mode == "implicit":
            from torch_admm_deconv_tpu.ops.implicit import admm_tv_implicit

            out = admm_tv_implicit(
                x,
                jnp.reshape(lmbd, ()),
                jnp.reshape(rho, ()),
                w,
                iso=self.iso,
                maxit=self.max_iters,
                tol=self.implicit_tol,
                iso_mode=self.iso_mode,
                backward_iters=self.implicit_backward_iters,
            )
        else:
            out = admm_tv(
                x,
                jnp.reshape(lmbd, ()),
                jnp.reshape(rho, ()),
                w,
                iso=self.iso,
                maxit=self.max_iters,
                iso_mode=self.iso_mode,
                remat=self.remat,
                use_pallas=self.use_pallas,
            )
        if self.bias:
            b = self.param("b", _uniform01, (1,))
            out = out + b[0]
        return self.activation(out)
