"""Implicit (fixed-point) gradients for the TV-ADMM solver.

The reference learns lambda/rho/PSF by unrolling all ``maxit`` (typically
100) solver iterations through autograd
(/root/reference/src/admmtor/eops/deconv.py:103-115 wrapped by
elayers/admmdeconv.py:63-64) — O(maxit) activation memory and a backward
pass as long as the forward. This module provides the beyond-reference
alternative: differentiate through the solver's *converged fixed point*
instead of its trajectory (deep-equilibrium style).

Let one ADMM iteration be ``v' = F(v; theta)`` with state
``v = (x, z_x, z_y, u_x, u_y)`` and parameters
``theta = (x_in, lambda, rho, kern)``. At convergence ``v* = F(v*; theta)``,
so by the implicit function theorem

    dv*/dtheta = (I - dF/dv)^{-1} dF/dtheta.

The VJP with cotangent ``w`` on ``v*`` is ``theta_bar = J_theta^T a`` where
``a`` solves ``(I - J_v^T) a = w``. Because the ADMM map is an averaged
(nonexpansive) operator, ``a`` is computed by the convergent Neumann
iteration ``a <- w + J_v^T a`` — each term one VJP of a single iteration.

Consequences:
* O(1) memory in iteration count — no activation storage, no remat ladder.
* The forward solve is free to use the fastest non-differentiable path and
  run to *convergence* (residual-stopped) rather than a fixed unroll.
* The backward cost is ``backward_iters`` single-step VJPs, independent of
  how many forward iterations convergence took.

Gradient semantics match the unrolled path in the converged limit
(tests/test_implicit.py checks this against ``admm_tv`` end-to-end); away
from convergence they are the standard truncated/phantom DEQ gradients.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from torch_admm_deconv_tpu.ops import fdops
from torch_admm_deconv_tpu.ops.solver import _htran, _residual_norms, _shrink


def _fixed_point_step(v, theta, iso: bool, iso_mode: str, im_shape):
    """One ADMM iteration as a pure function of (state, parameters).

    Unlike the forward solver (which hoists ``H^T x_in`` and the frequency
    denominator out of the loop), everything theta-dependent is recomputed
    here so ``jax.vjp`` sees the full dependence of one iteration on
    ``theta`` — this function is only ever evaluated/differentiated at the
    fixed point, never iterated hot.
    """
    x, z_x, z_y, u_x, u_y = v
    xin, lmbd, rho, kern = theta
    dtype = xin.dtype
    kern = None if kern.size == 0 else kern

    freq_c = fdops.freq_denominator(im_shape, rho, kern, dtype)
    hty = _htran(xin, kern, im_shape, dtype)

    s = hty + rho * (fdops.dx_t(z_x - u_x) + fdops.dy_t(z_y - u_y))
    x = jnp.fft.irfft2(
        freq_c * jnp.fft.rfft2(s, axes=(-2, -1)), s=im_shape, axes=(-2, -1)
    )
    dxk = fdops.dx(x)
    dyk = fdops.dy(x)
    tau = lmbd / rho
    z_x, z_y = _shrink(dxk + u_x, dyk + u_y, tau, iso, iso_mode)
    u_x = u_x + dxk - z_x
    u_y = u_y + dyk - z_y
    return (x, z_x, z_y, u_x, u_y)


def _solve_full_state(xin, lmbd, rho, kern, iso, maxit, tol, iso_mode):
    """Residual-stopped fixed-rho solve returning the full ADMM state.

    Same update equations as :func:`ops.solver.admm_tv_adaptive` with
    ``adapt_rho=False`` (loop-invariants hoisted, one rfft2+irfft2 per
    iteration), but carries (x, z, u) out so the implicit VJP can linearize
    the step at the fixed point.
    """
    im_shape = xin.shape[-2:]
    dtype = xin.dtype
    freq_c = fdops.freq_denominator(im_shape, rho, kern, dtype)
    hty = _htran(xin, kern, im_shape, dtype)
    tau = lmbd / rho

    n_elems = 2.0 * xin.size
    scale = jnp.sqrt(jnp.asarray(n_elems, dtype))
    reduce_all = jnp.sum

    def cond(carry):
        k, *_state, r, s = carry
        return jnp.logical_and(k < maxit, jnp.logical_or(r > tol, s > tol))

    def body(carry):
        k, x, z_x, z_y, u_x, u_y, _, _ = carry
        s_rhs = hty + rho * (fdops.dx_t(z_x - u_x) + fdops.dy_t(z_y - u_y))
        x = jnp.fft.irfft2(
            freq_c * jnp.fft.rfft2(s_rhs, axes=(-2, -1)), s=im_shape, axes=(-2, -1)
        )
        dxk = fdops.dx(x)
        dyk = fdops.dy(x)
        z_x_new, z_y_new = _shrink(dxk + u_x, dyk + u_y, tau, iso, iso_mode)
        u_x = u_x + dxk - z_x_new
        u_y = u_y + dyk - z_y_new
        r, s = _residual_norms(x, z_x_new, z_y_new, z_x, z_y, rho, reduce_all)
        return (k + 1, x, z_x_new, z_y_new, u_x, u_y, r / scale, s / scale)

    zeros = jnp.zeros_like(xin)
    one = jnp.ones((), dtype)
    init = (jnp.zeros((), jnp.int32), zeros, zeros, zeros, zeros, zeros, one, one)
    _, x, z_x, z_y, u_x, u_y, _, _ = jax.lax.while_loop(cond, body, init)
    return (x, z_x, z_y, u_x, u_y)


def _solve_state_dispatch(xin, lmbd, rho, kern, iso, maxit, tol, iso_mode,
                          precision="high"):
    """Fastest available residual-stopped fixed-rho solve returning the full
    (x, z_x, z_y, u_x, u_y) state.

    When the whole-solve-in-VMEM Pallas kernel supports the configuration
    (f32, tile-aligned, no/symmetric concrete PSF — kernels/vmem_solver.py),
    the forward runs there with per-block stopping and the exit state read
    straight out of VMEM; rho adaptation is disabled (rho_mu=inf) so the
    state is a fixed point of the *given* rho, which is what the implicit
    VJP linearizes. Otherwise the XLA while_loop solve runs. Either way the
    custom VJP below sees the same (state, theta) interface — this is how
    the measured ~3x VMEM solve speedup reaches training
    (gradient_mode='implicit')."""
    kern_arr = None if kern.size == 0 else kern
    from torch_admm_deconv_tpu.kernels.vmem_solver import (
        adaptive_vmem_available,
        admm_tv_adaptive_vmem,
    )

    if adaptive_vmem_available(
        xin.shape, xin.dtype, kern_arr, iso, iso_mode, return_state=True
    ):
        _, state = admm_tv_adaptive_vmem(
            xin,
            jax.lax.stop_gradient(lmbd),
            jax.lax.stop_gradient(rho),
            kern_arr,
            iso=iso,
            maxit=maxit,
            tol=tol,
            iso_mode=iso_mode,
            rho_mu=1e30,  # residual balancing off: fixed-rho fixed point
            return_state=True,
            # full-f32 x-updates by default: the implicit VJP linearizes at
            # the returned state, and a user tol below the bf16x3 noise
            # floor must still be reachable (ADVICE r2 finding 4). Callers
            # that accept the inexact-ADMM schedule pass precision='mixed'.
            precision=precision,
        )
        return state
    return _solve_full_state(xin, lmbd, rho, kern_arr, iso, maxit, tol, iso_mode)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _implicit(xin, lmbd, rho, kern, iso, maxit, tol, iso_mode, backward_iters,
              precision):
    v = _solve_state_dispatch(xin, lmbd, rho, kern, iso, maxit, tol, iso_mode,
                              precision)
    return v[0]


def _implicit_fwd(xin, lmbd, rho, kern, iso, maxit, tol, iso_mode, backward_iters,
                  precision):
    v = _solve_state_dispatch(xin, lmbd, rho, kern, iso, maxit, tol, iso_mode,
                              precision)
    return v[0], (v, (xin, lmbd, rho, kern))


def _implicit_bwd(iso, maxit, tol, iso_mode, backward_iters, precision, res, g):
    v_star, theta = res
    im_shape = theta[0].shape[-2:]

    step = lambda v, th: _fixed_point_step(v, th, iso, iso_mode, im_shape)  # noqa: E731
    _, pullback = jax.vjp(step, v_star, theta)

    zeros = jnp.zeros_like(v_star[0])
    w = (g, zeros, zeros, zeros, zeros)

    def neumann(a, _):
        va, _ = pullback(a)
        a_next = jax.tree_util.tree_map(jnp.add, w, va)
        return a_next, None

    a, _ = jax.lax.scan(neumann, w, None, length=backward_iters)
    _, theta_bar = pullback(a)
    return theta_bar


_implicit.defvjp(_implicit_fwd, _implicit_bwd)


@partial(
    jax.jit,
    static_argnames=("iso", "maxit", "tol", "iso_mode", "backward_iters", "precision"),
)
def admm_tv_implicit(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern: Optional[jnp.ndarray] = None,
    iso: bool = False,
    maxit: int = 500,
    *,
    tol: float = 1e-8,
    iso_mode: str = "sample",
    backward_iters: int = 50,
    precision: str = "high",
) -> jnp.ndarray:
    """TV-ADMM with implicit (fixed-point) gradients.

    Forward: residual-stopped fixed-rho solve (same math as
    :func:`ops.solver.admm_tv_adaptive` with ``adapt_rho=False``). Backward:
    implicit-function-theorem VJP at the fixed point via a
    ``backward_iters``-term Neumann series — O(1) memory in the iteration
    count, exact in the converged limit.

    Differentiable w.r.t. ``xin``, ``lmbd``, ``rho`` and (when given) the
    PSF ``kern`` — everything the reference's unrolled ``ADMMDeconv`` learns
    (elayers/admmdeconv.py:26-51), at a fraction of the train-time memory.
    Use :func:`ops.solver.admm_tv` when exact unrolled gradients of a fixed
    truncated iteration are wanted (reference parity); use this when the
    solve runs to convergence.

    Args mirror :func:`ops.solver.admm_tv`; ``tol`` is the forward stopping
    tolerance (keep it tight — implicit gradients assume a fixed point).
    """
    xin = jnp.asarray(xin)
    squeeze = 4 - xin.ndim
    for _ in range(squeeze):
        xin = xin[None]
    dtype = xin.dtype
    lmbd = jnp.asarray(lmbd, dtype).reshape(())
    rho = jnp.asarray(rho, dtype).reshape(())
    if kern is None:
        kern = jnp.zeros((1, 1, 0, 0), dtype)
    out = _implicit(
        xin, lmbd, rho, kern, iso, maxit, float(tol), iso_mode,
        int(backward_iters), precision,
    )
    for _ in range(squeeze):
        out = out[0]
    return out
