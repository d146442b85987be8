"""Batched FFT-based TV-regularized ADMM deconvolution — the framework core.

Capability parity with the reference solver ``fft_admm_tv``
(``/root/reference/src/admmtor/eops/deconv.py:35-117``), re-designed for TPU:

* The circulant x-update runs as exactly one ``rfft2`` + one ``irfft2`` per
  iteration (f32 / complex64 — FFT precision matters for convergence); the
  frequency diagonal multiply is a tiny fused elementwise op.
* All spatial operators (D, D^T) are one-pixel circular rolls, not 2x2
  grouped convs — pure VPU work XLA fuses away (see ``ops/fdops.py``).
* The per-iteration elementwise chain (gradients -> shrinkage -> dual update
  -> next x-update right-hand side) is algebraically regrouped so each
  iteration is [FFT solve] + [one fused elementwise pass]; the fused pass has
  an optional Pallas kernel (``kernels/fused_admm.py``) that does it in a
  single HBM round-trip.
* The loop-invariant ``H^T x_in`` is hoisted out of the loop (the reference
  recomputes it every iteration, deconv.py:104).
* The fixed-iteration path is a ``lax.scan`` (differentiable end-to-end for
  unrolled/learned ADMM, with optional per-iteration rematerialization); the
  classical path adds residual-based stopping and adaptive rho under
  ``lax.while_loop`` — capabilities the reference lacks.

Semantics notes (kept bit-compatible where parity is measured):
* ``iso=True`` with ``iso_mode='compat'`` reproduces the reference's
  batch+channel-coupled ``block_thresh`` (deconv.py:19-24) applied to z_x and
  z_y separately. ``'sample'`` and ``'joint'`` are corrected variants.
* Empty/None kernel => pure TV denoising (H = I), as deconv.py:46-47, 86-87.
* x, z, u initialize to zero; returns the final x (deconv.py:61-67, 117).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from torch_admm_deconv_tpu.ops import fdops
from torch_admm_deconv_tpu.ops.prox import (
    block_thresh,
    block_thresh_joint,
    soft_thresh,
)


class ADMMState(NamedTuple):
    """Carried state of one ADMM instance batch."""

    x: jnp.ndarray  # current primal estimate (B, C, H, W)
    s: jnp.ndarray  # right-hand side of the next x-update (spatial domain)
    u_x: jnp.ndarray  # scaled dual for the x-gradient split
    u_y: jnp.ndarray  # scaled dual for the y-gradient split


def _shrink(dxu, dyu, tau, iso: bool, iso_mode: str):
    if not iso:
        return soft_thresh(dxu, tau), soft_thresh(dyu, tau)
    if iso_mode == "compat":
        # reference behaviour: independent x/y shrinkage, norm over (B, C)
        return block_thresh(dxu, tau, axis=(0, 1)), block_thresh(dyu, tau, axis=(0, 1))
    if iso_mode == "sample":
        return block_thresh(dxu, tau, axis=(1,)), block_thresh(dyu, tau, axis=(1,))
    if iso_mode == "joint":
        return block_thresh_joint(dxu, dyu, tau)
    raise ValueError(f"unknown iso_mode: {iso_mode!r}")


def _x_update(s: jnp.ndarray, freq_c: jnp.ndarray, im_shape: Tuple[int, int]) -> jnp.ndarray:
    """x = irfft2(freq_c * rfft2(s)) — the circulant diagonal solve."""
    return jnp.fft.irfft2(freq_c * jnp.fft.rfft2(s, axes=(-2, -1)), s=im_shape, axes=(-2, -1))


def _resolve_fft_impl(fft_impl: str, kern=None) -> str:
    """'auto' picks the Hartley matmul path on TPU when the x-update
    spectrum is per-axis even (no/symmetric PSF), else the complex MXU DFT;
    XLA FFT elsewhere (see ops/mxu_fft.py for the rationale)."""
    if fft_impl != "auto":
        return fft_impl
    if jax.default_backend() != "tpu":
        return "xla"
    from torch_admm_deconv_tpu.ops.mxu_fft import psf_is_axis_symmetric

    concrete = kern is None or isinstance(kern, (int, float)) or hasattr(kern, "__array__")
    try:
        if concrete and psf_is_axis_symmetric(kern):
            return "dht"
    except Exception:  # traced kernel (learnable PSF): symmetry unknown
        pass
    return "mxu"


def _make_x_update(fft_impl: str, freq_c, im_shape):
    if fft_impl == "dht":
        from torch_admm_deconv_tpu.ops.mxu_fft import (
            cas_mats,
            freq_solve_dht,
            mirror_freq_full,
        )

        mats = cas_mats(*im_shape)
        freq_full = mirror_freq_full(freq_c, im_shape[1])
        return lambda s: freq_solve_dht(s, freq_full, mats)
    if fft_impl == "mxu":
        from torch_admm_deconv_tpu.ops.mxu_fft import dft_mats, freq_solve_mxu

        mats = dft_mats(*im_shape)
        return lambda s: freq_solve_mxu(s, freq_c, mats)
    return lambda s: _x_update(s, freq_c, im_shape)


def _htran(xin, kern, im_shape, dtype):
    """Loop-invariant H^T x_in, computed in the frequency domain.

    Hoisted out of the iteration (the reference recomputes it per iteration,
    deconv.py:104) and FFT-based rather than a depthwise conv (MXU-hostile,
    pathologically slow to compile on TPU — see fdops.psf_otf_centered).
    """
    if kern is None or kern.size == 0:
        return xin
    otf_c = fdops.psf_otf_centered(kern.astype(dtype), im_shape)
    return fdops.htran_fft(xin, otf_c, im_shape)


def _elementwise_step(x, u_x, u_y, hty, rho, tau, iso, iso_mode):
    """Post-FFT half of iteration k fused with the pre-FFT half of k+1.

    Given the fresh primal x and current duals, computes the shrinkage and
    dual updates, then the next x-update RHS
    ``s' = H^T y + rho * (Dx^T(z_x - u_x') + Dy^T(z_y - u_y'))``.
    One pass over HBM when fused (XLA fuses this chain; the Pallas kernel in
    kernels/fused_admm.py does it explicitly).
    """
    dxk = fdops.dx(x)
    dyk = fdops.dy(x)
    z_x, z_y = _shrink(dxk + u_x, dyk + u_y, tau, iso, iso_mode)
    u_x = u_x + dxk - z_x
    u_y = u_y + dyk - z_y
    s = hty + rho * (fdops.dx_t(z_x - u_x) + fdops.dy_t(z_y - u_y))
    return s, z_x, z_y, u_x, u_y


def _make_step(x_update, hty, rho, tau, iso, iso_mode, elementwise):
    def step(state: ADMMState, _):
        x = x_update(state.s)
        s, _, _, u_x, u_y = elementwise(x, state.u_x, state.u_y, hty, rho, tau, iso, iso_mode)
        return ADMMState(x=x, s=s, u_x=u_x, u_y=u_y), None

    return step


def admm_tv(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern: Optional[jnp.ndarray] = None,
    iso: bool = False,
    maxit: int = 100,
    *,
    iso_mode: str = "compat",
    remat: bool = False,
    use_pallas: bool = False,
    fft_impl: str = "auto",
    precision: str = "high",
    fast_frac: float = 0.75,
) -> jnp.ndarray:
    """Fixed-iteration TV-ADMM (reference-parity path, differentiable).

    Args:
      xin: (B, C, H, W) blurred/noisy batch (also accepts (C, H, W)/(H, W)).
      lmbd, rho: TV weight and penalty — python or traced scalars (learnable).
      kern: (1, 1, kh, kw) PSF, or None/empty for pure TV denoising.
      iso: isotropic (block) vs anisotropic (soft) shrinkage.
      maxit: fixed iteration count, unrolled through autodiff when
        differentiated (this is how lambda/rho/PSF are learned).
      iso_mode: 'compat' | 'sample' | 'joint' (see module docstring).
      remat: rematerialize each iteration under autodiff (memory vs FLOPs for
        100-iteration unrolls).
      use_pallas: route the fused elementwise pass through the Pallas TPU
        kernel (anisotropic / per-sample modes; falls back to XLA otherwise).
      precision: 'high' (default) | 'mixed'. Only consulted on the VMEM
        fast path: 'mixed' runs the first 3/4 of the iterations with
        single-pass bf16 x-update matmuls (inexact ADMM — the exact bf16x3
        tail contracts the early roundoff; measured 2.0x faster, max
        deviation ~3e-4 at 200 iters / 512^2). Ignored on the scan path.
      fast_frac: fraction of iterations in the fast single-pass phase when
        ``precision='mixed'`` (VMEM path only; deviation study:
        scripts/bench_mixed_precision.py).

    Returns the restored batch, same shape as ``xin``.
    """
    xin = jnp.asarray(xin)
    if use_pallas and not remat:
        # Whole-solve-in-VMEM fast path: all maxit iterations on-chip, HBM
        # traffic = read(hty) + write(x). Not differentiable — remat=True
        # signals a training unroll, which stays on the scan path. The
        # eligibility check needs a CONCRETE kernel (PSF symmetry), so this
        # dispatch happens eagerly, outside the jitted implementations;
        # under an outer jit trace it fails safe to the scan path.
        from torch_admm_deconv_tpu.kernels.vmem_solver import (
            admm_tv_vmem,
            vmem_solve_available,
        )

        squeeze = 4 - xin.ndim
        shape = (1,) * squeeze + xin.shape
        eff_mode = iso_mode
        if iso and iso_mode == "compat" and shape[0] == 1:
            # the reference's batch+channel-coupled pixelnorm over a single
            # sample is exactly the channel-coupled 'sample' norm, which the
            # VMEM kernel supports — the eval harness's batch-1 case.
            eff_mode = "sample"
        if vmem_solve_available(shape, xin.dtype, kern, iso, eff_mode):
            xb = xin.reshape(shape)
            out = admm_tv_vmem(
                xb, lmbd, rho, kern, iso, maxit, iso_mode=eff_mode,
                precision=precision, fast_frac=fast_frac,
            )
            return out.reshape(xin.shape)
    return _admm_tv_scan(
        xin,
        lmbd,
        rho,
        kern,
        iso=iso,
        maxit=maxit,
        iso_mode=iso_mode,
        remat=remat,
        use_pallas=use_pallas,
        fft_impl=fft_impl,
    )


@partial(
    jax.jit,
    static_argnames=("iso", "maxit", "iso_mode", "remat", "use_pallas", "fft_impl"),
)
def _admm_tv_scan(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern: Optional[jnp.ndarray] = None,
    iso: bool = False,
    maxit: int = 100,
    *,
    iso_mode: str = "compat",
    remat: bool = False,
    use_pallas: bool = False,
    fft_impl: str = "auto",
) -> jnp.ndarray:
    """The lax.scan implementation of :func:`admm_tv` (differentiable)."""
    squeeze = 4 - xin.ndim
    for _ in range(squeeze):
        xin = xin[None]
    im_shape = xin.shape[-2:]
    dtype = xin.dtype

    lmbd = jnp.asarray(lmbd, dtype).reshape(())
    rho = jnp.asarray(rho, dtype).reshape(())
    tau = lmbd / rho

    freq_c = fdops.freq_denominator(im_shape, rho, kern, dtype)
    hty = _htran(xin, kern, im_shape, dtype)

    elementwise = _elementwise_step
    if use_pallas and (not iso or iso_mode != "compat"):
        from torch_admm_deconv_tpu.kernels.fused_admm import fused_elementwise_step

        elementwise = fused_elementwise_step

    x_update = _make_x_update(_resolve_fft_impl(fft_impl, kern), freq_c, im_shape)
    step = _make_step(x_update, hty, rho, tau, iso, iso_mode, elementwise)
    if remat:
        step = jax.checkpoint(step)

    zeros = jnp.zeros_like(xin)
    init = ADMMState(x=zeros, s=hty, u_x=zeros, u_y=zeros)
    final, _ = jax.lax.scan(step, init, None, length=maxit)

    out = final.x
    for _ in range(squeeze):
        out = out[0]
    return out


def _residual_norms(x, z_x, z_y, z_x_old, z_y_old, rho, axis_reduce: Callable):
    """Standard scaled-form ADMM residuals (Boyd et al. §3.3)."""
    rx = fdops.dx(x) - z_x
    ry = fdops.dy(x) - z_y
    r = jnp.sqrt(axis_reduce(rx * rx + ry * ry))
    sdual = rho * (fdops.dx_t(z_x - z_x_old) + fdops.dy_t(z_y - z_y_old))
    s = jnp.sqrt(axis_reduce(sdual * sdual))
    return r, s


class AdaptiveResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # iterations actually run
    r_norm: jnp.ndarray  # final primal residual (relative)
    s_norm: jnp.ndarray  # final dual residual (relative)
    rho: jnp.ndarray  # final penalty


@partial(
    jax.jit,
    static_argnames=("iso", "maxit", "iso_mode", "adapt_rho", "psum_axis", "fft_impl"),
)
def admm_tv_adaptive(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern: Optional[jnp.ndarray] = None,
    iso: bool = False,
    maxit: int = 500,
    *,
    tol: float = 1e-4,
    iso_mode: str = "sample",
    adapt_rho: bool = True,
    rho_mu: float = 10.0,
    rho_scale: float = 2.0,
    check_every: int = 1,
    psum_axis: Optional[str] = None,
    fft_impl: str = "auto",
) -> AdaptiveResult:
    """Classical TV-ADMM with residual stopping and adaptive rho.

    Beyond-reference capability (the reference has no stopping criterion or
    rho adaptation — fixed ``maxit`` only, deconv.py:103). Runs a
    ``lax.while_loop`` until both relative primal and dual residuals fall
    below ``tol`` or ``maxit`` is hit. With ``adapt_rho`` the penalty follows
    the standard residual-balancing rule (Boyd §3.4.1): rho *= rho_scale when
    r > rho_mu * s, rho /= rho_scale when s > rho_mu * r, with the scaled
    duals rescaled inversely; the frequency denominator is rebuilt from the
    cached |H|^2 / |D|^2 maps (cheap elementwise work, no FFTs).

    ``psum_axis``: when running under ``shard_map`` with the image spatially
    sharded, residual norms are globally reduced with ``lax.psum`` over this
    mesh axis so all shards agree on stopping and rho jointly
    (BASELINE.json config 5).

    Not differentiable (while_loop); use :func:`admm_tv` for training.
    """
    squeeze = 4 - xin.ndim
    for _ in range(squeeze):
        xin = xin[None]
    im_shape = xin.shape[-2:]
    dtype = xin.dtype

    lmbd = jnp.asarray(lmbd, dtype).reshape(())
    rho0 = jnp.asarray(rho, dtype).reshape(())

    d2 = fdops.grad_otf_abs2(im_shape, dtype)
    if kern is None or kern.size == 0:
        h_abs2 = jnp.ones((), dtype)
    else:
        otf = fdops.psf_otf(kern.astype(dtype), im_shape)
        h_abs2 = (otf.real**2 + otf.imag**2).reshape(im_shape[0], im_shape[1] // 2 + 1)
    hty = _htran(xin, kern, im_shape, dtype)

    def reduce_all(v):
        total = jnp.sum(v)
        if psum_axis is not None:
            total = jax.lax.psum(total, axis_name=psum_axis)
        return total

    n_elems = reduce_all(jnp.ones_like(xin)) * 2.0  # both gradient fields
    scale = jnp.sqrt(n_elems)

    zeros = jnp.zeros_like(xin)

    impl = _resolve_fft_impl(fft_impl, kern)
    if impl == "dht":
        from torch_admm_deconv_tpu.ops.mxu_fft import (
            cas_mats,
            freq_solve_dht,
            mirror_freq_full,
        )

        cmats = cas_mats(*im_shape)

        def solve(s_rhs, freq_c):
            return freq_solve_dht(s_rhs, mirror_freq_full(freq_c, im_shape[1]), cmats)

    elif impl == "mxu":
        from torch_admm_deconv_tpu.ops.mxu_fft import dft_mats, freq_solve_mxu

        mats = dft_mats(*im_shape)
        solve = lambda s_rhs, freq_c: freq_solve_mxu(s_rhs, freq_c, mats)  # noqa: E731
    else:
        solve = lambda s_rhs, freq_c: _x_update(s_rhs, freq_c, im_shape)  # noqa: E731

    def cond2(carry):
        (k, x, z_x, z_y, u_x, u_y, r, s, rho_k) = carry
        return jnp.logical_and(k < maxit, jnp.logical_or(r > tol, s > tol))

    def body2(carry):
        (k, x, z_x, z_y, u_x, u_y, _, _, rho_k) = carry
        freq_c = 1.0 / (h_abs2 + rho_k * d2)
        s_rhs = hty + rho_k * (fdops.dx_t(z_x - u_x) + fdops.dy_t(z_y - u_y))
        x = solve(s_rhs, freq_c)
        dxk = fdops.dx(x)
        dyk = fdops.dy(x)
        tau = lmbd / rho_k
        z_x_new, z_y_new = _shrink(dxk + u_x, dyk + u_y, tau, iso, iso_mode)
        u_x = u_x + dxk - z_x_new
        u_y = u_y + dyk - z_y_new

        r, s = _residual_norms(x, z_x_new, z_y_new, z_x, z_y, rho_k, reduce_all)
        r = r / scale
        s = s / scale

        if adapt_rho:
            grow = r > rho_mu * s
            shrink = s > rho_mu * r
            factor = jnp.where(grow, rho_scale, jnp.where(shrink, 1.0 / rho_scale, 1.0))
            rho_k = rho_k * factor
            u_x = u_x / factor
            u_y = u_y / factor
        return (k + 1, x, z_x_new, z_y_new, u_x, u_y, r, s, rho_k)

    one = jnp.ones((), dtype)
    init = (jnp.zeros((), jnp.int32), zeros, zeros, zeros, zeros, zeros, one, one, rho0)
    k, x, *_rest, r, s, rho_f = jax.lax.while_loop(cond2, body2, init)

    for _ in range(squeeze):
        x = x[0]
    return AdaptiveResult(x=x, iters=k, r_norm=r, s_norm=s, rho=rho_f)


def tv_objective(x, xin, lmbd, kern=None, iso: bool = False):
    """Diagnostic TV objective: 0.5 ||H x - y||^2 + lambda * TV(x)."""
    if kern is None or kern.size == 0:
        hx = x
    else:
        im_shape = x.shape[-2:]
        otf_c = fdops.psf_otf_centered(kern.astype(x.dtype), im_shape)
        hx = jnp.fft.irfft2(
            otf_c * jnp.fft.rfft2(x, axes=(-2, -1)), s=im_shape, axes=(-2, -1)
        )
    data = 0.5 * jnp.sum((hx - xin) ** 2)
    gx, gy = fdops.dx(x), fdops.dy(x)
    if iso:
        tv = jnp.sum(jnp.sqrt(gx * gx + gy * gy + 1e-15))
    else:
        tv = jnp.sum(jnp.abs(gx) + jnp.abs(gy))
    return data + lmbd * tv
