"""Pallas TPU kernel: the ENTIRE fixed-iteration TV-ADMM solve in VMEM.

The scan-based solver (ops/solver.py) pays, per iteration, one HBM
round-trip for the x-update matmuls plus one fused elementwise pass —
~7 plane-sized HBM transfers per iteration even with the fused step kernel
(kernels/fused_admm.py). But one 512x512 f32 plane is 1 MB: the whole ADMM
state for an image plane (s, u_x, u_y) plus the shape-constant Hartley
matrices and spectrum fit comfortably in VMEM. This kernel therefore runs
ALL ``maxit`` iterations with the state resident on-chip:

    per grid program (one (batch*channel) plane):
        s <- hty, u <- 0                               (VMEM init)
        repeat maxit:
            x  = T_h ((T_h s T_w) * freq') T_w          (4 MXU matmuls;
                 freq' = freq/(h*w) folded host-side)
            dx, dy, shrink, dual, next s                (VPU + pltpu.roll)
        write x                                        (one HBM store)

HBM traffic for a whole B-image solve collapses to read(hty) + write(x)
(+ the ~3 MB of shape constants, fetched once): ~50x less than the
scan path at maxit=200. The x-update uses the separable Hartley (cas)
factorization (see ops/mxu_fft.py) — valid whenever the x-update spectrum is
even per axis, i.e. for the empty-kernel denoising mode every trained
reference model uses and for symmetric PSFs (gaussian etc.); callers gate
via :func:`vmem_solve_available`.

The reference has no analog of any of this — its solver is ~10 separate
CUDA kernel launches per iteration with all state in HBM
(/root/reference/src/admmtor/eops/deconv.py:103-115).

Not differentiable (raw pallas_call): this is the inference/classical-solve
fast path. Training unrolls use the scan solver, which is.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-15
# v5e exposes ~128 MB of VMEM to Mosaic (probed empirically: a 1024x1024
# block with 10 resident planes compiles and runs at a 120 MB limit); keep
# headroom for Mosaic's own pipelining buffers. The kernel stays faster
# than the scan path all the way up to the budget (measured 1.4x at 768^2,
# 1.2x at 1024^2, 2.7x at 512^2).
_VMEM_BUDGET_BYTES = 100 * 1024 * 1024


# --- bf16x3 ("HIGH"-precision) matmuls -------------------------------------
# Mosaic supports only DEFAULT (single-pass bf16 — too lossy: the DFT
# roundoff amplifies through the shrinkage nonlinearity) and HIGHEST
# (6-pass — measured ~97% MXU-bound, all of it precision passes). The sweet
# spot is the 3-pass bf16x3 split XLA uses for Precision.HIGH (and that
# ops/mxu_fft._mm relies on): a = hi(a) + lo(a) in bf16, keep the three
# dominant cross products, accumulate in f32 on the MXU.


def _split(v):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm3(a_hi, a_lo, b_hi, b_lo):
    return _dot(a_hi, b_hi) + _dot(a_hi, b_lo) + _dot(a_lo, b_hi)


def _make_xform(mats, fast: bool):
    """One full spectral transform v -> T(v) as MXU matmuls.

    ``mats`` holds split (hi, lo) bf16 matrices. 4 entries (th, tw pairs)
    select the separable cas-cas transform — 2 matmuls, valid for per-axis-
    even spectra. 8 entries (th, thp, cw, sw pairs) select the TRUE 2-D
    Hartley transform DHT2(v) = (T_h v) C_w + (T_h' v) S_w — 4 matmuls,
    valid for ANY real PSF's jointly-even spectrum (ops/mxu_fft.py,
    'Hartley-pair'); T_h'[k] = T_h[(H-k) % H] is precomputed host-side.

    ``fast``: single-pass bf16 matmuls (3x fewer MXU passes, ~4e-3 relative
    roundoff) for the inexact-ADMM early phase; else the bf16x3 split
    (~1e-5)."""
    if len(mats) == 4:
        th_hi, th_lo, tw_hi, tw_lo = mats
        if fast:

            def xform(v):
                a = _dot(th_hi, v.astype(jnp.bfloat16))
                return _dot(a.astype(jnp.bfloat16), tw_hi)

        else:

            def xform(v):
                v_hi, v_lo = _split(v)
                a = _mm3(th_hi, th_lo, v_hi, v_lo)
                a_hi, a_lo = _split(a)
                return _mm3(a_hi, a_lo, tw_hi, tw_lo)

    else:
        th_hi, th_lo, thp_hi, thp_lo, cw_hi, cw_lo, sw_hi, sw_lo = mats
        if fast:

            def xform(v):
                vb = v.astype(jnp.bfloat16)
                a1 = _dot(th_hi, vb)
                a2 = _dot(thp_hi, vb)
                return _dot(a1.astype(jnp.bfloat16), cw_hi) + _dot(
                    a2.astype(jnp.bfloat16), sw_hi
                )

        else:

            def xform(v):
                v_hi, v_lo = _split(v)
                a1 = _mm3(th_hi, th_lo, v_hi, v_lo)
                a2 = _mm3(thp_hi, thp_lo, v_hi, v_lo)
                a1_hi, a1_lo = _split(a1)
                a2_hi, a2_lo = _split(a2)
                return _mm3(a1_hi, a1_lo, cw_hi, cw_lo) + _mm3(
                    a2_hi, a2_lo, sw_hi, sw_lo
                )

    return xform


def _make_interleaved_kernel(
    maxit: int, iso_mode, g: int, fast_iters: int = 0, n_mats: int = 4
):
    """Per-plane software-pipelined variant of the fixed-iteration kernel
    (round 3, VERDICT r2 'push MFU past ~40%').

    The batched kernel runs ALL g planes' matmuls, then the whole block's
    elementwise chain — the MXU idles for the entire VPU phase. Here each
    plane's full iteration (4 cas-cas matmuls -> shrinkage -> dual update ->
    next RHS) completes before the next plane starts, so Mosaic can overlap
    plane i+1's independent matmuls with plane i's VPU tail. Only valid for
    the per-plane shrinkage modes (aniso / 'joint' iso — 'sample' couples
    planes through the block norm and stays on the batched kernel).
    Mathematically identical per plane; selected via
    ``admm_tv_vmem(..., schedule='interleaved')`` for A/B on hardware."""
    assert iso_mode in (None, "joint")

    def kernel(*refs):
        rho_ref, tau_ref, hty_ref, freq_ref = refs[:4]
        mat_refs = refs[4 : 4 + n_mats]
        x_ref = refs[4 + n_mats]
        s_scr, ux_scr, uy_scr = refs[5 + n_mats : 8 + n_mats]
        rho = rho_ref[0, 0]
        tau = tau_ref[0, 0]
        h = hty_ref.shape[-2]
        w = hty_ref.shape[-1]
        hty = hty_ref[0]  # (g, H, W)

        s_scr[...] = hty
        ux_scr[...] = jnp.zeros_like(hty)
        uy_scr[...] = jnp.zeros_like(hty)
        x_ref[0] = jnp.zeros_like(hty)

        mats = tuple(m[...] for m in mat_refs)
        freq = freq_ref[...]  # carries the 1/(H*W) normalization (host-side)

        def body_with(xform):
            def body(_, carry):
                for i in range(g):
                    y = xform(s_scr[i]) * freq
                    x = xform(y)
                    dx = x - pltpu.roll(x, 1, axis=1)
                    dyv = x - pltpu.roll(x, 1, axis=0)
                    ax = dx + ux_scr[i]
                    ay = dyv + uy_scr[i]
                    if iso_mode is None:
                        zx = ax - jnp.clip(ax, -tau, tau)
                        zy = ay - jnp.clip(ay, -tau, tau)
                    else:  # 'joint'
                        mag = jnp.sqrt(ax * ax + ay * ay + _EPS)
                        scale = jnp.maximum(1.0 - tau / mag, 0.0)
                        zx = scale * ax
                        zy = scale * ay
                    uxn = ax - zx
                    uyn = ay - zy
                    tx = zx - uxn
                    ty = zy - uyn
                    s_scr[i] = hty[i] + rho * (
                        tx
                        - pltpu.roll(tx, w - 1, axis=1)
                        + ty
                        - pltpu.roll(ty, h - 1, axis=0)
                    )
                    ux_scr[i] = uxn
                    uy_scr[i] = uyn
                    x_ref[0, i] = x
                return carry

            return body

        if fast_iters > 0:
            jax.lax.fori_loop(0, fast_iters, body_with(_make_xform(mats, True)), 0)
        jax.lax.fori_loop(
            0, maxit - fast_iters, body_with(_make_xform(mats, False)), 0
        )

    return kernel


def _make_kernel(maxit: int, iso_mode, g: int, fast_iters: int = 0, n_mats: int = 4,
                 ablate: str = ""):
    """iso_mode: None (anisotropic soft shrinkage), 'joint' (corrected
    isotropic TV — pointwise (zx, zy) block norm), or 'sample' (channel-
    coupled isotropic norm — blocks carry all ``g`` channels of a sample).

    ``fast_iters``: run the FIRST ``fast_iters`` iterations with single-pass
    bf16 x-update matmuls and only the remainder with the bf16x3 split —
    inexact ADMM: early x-update roundoff is contracted away by the later
    exact iterations (Eckstein & Bertsekas 1992, summable-error condition
    holds since the error stops after fast_iters).

    ``n_mats``: 4 (symmetric cas-cas path) or 8 (general-PSF Hartley-pair
    path, see :func:`_make_xform`).

    ``ablate``: PERF-AUDIT ONLY — produces numerically WRONG solves that
    time a subset of the per-iteration work so the VPU residue can be
    decomposed without a device profiler (scripts/vpu_ablation.py):
    '' (real kernel) | 'no_roll' (every pltpu.roll replaced by identity —
    same ALU ops, zero lane/sublane rotations) | 'no_shrink' (rolls and
    stores kept, shrinkage/dual ALU dropped) | 'mxu_only' (x-update matmuls
    and loop only — the elementwise chain is skipped entirely).

    MXU shape (round 3, VERDICT r2 'push MFU past ~40%'): the W-side
    matmul of each transform runs ONCE over the whole (g*H, W) block —
    one large matmul instead of g small dependent ones — and the g H-side
    matmuls are mutually independent, so the MXU pipelines them without
    serial stalls. Blocks pack multiple planes per grid program even in the
    elementwise (aniso/'joint') shrinkage modes, where packing cannot change
    semantics (see ``_fixed_pack``)."""

    def kernel(*refs):
        rho_ref, tau_ref, hty_ref, freq_ref = refs[:4]
        mat_refs = refs[4 : 4 + n_mats]
        x_ref = refs[4 + n_mats]
        if n_mats == 4:
            s_scr, ux_scr, uy_scr, y_scr, t_scr = refs[5 + n_mats :]
            a_scr = None
        else:
            s_scr, ux_scr, uy_scr, y_scr, t_scr, a_scr = refs[5 + n_mats :]
        rho = rho_ref[0, 0]
        tau = tau_ref[0, 0]
        h = hty_ref.shape[-2]
        w = hty_ref.shape[-1]
        hty = hty_ref[0]  # (g, H, W)

        # x, z, u start at zero => first RHS is exactly hty (deconv.py:61-67).
        # t_scr is zeroed so a maxit=0 solve returns the x init (zeros), the
        # same contract as the scan solver's unexecuted loop.
        s_scr[...] = hty
        ux_scr[...] = jnp.zeros_like(hty)
        uy_scr[...] = jnp.zeros_like(hty)
        t_scr[...] = jnp.zeros_like(hty)

        mats = tuple(m[...] for m in mat_refs)
        freq = freq_ref[...]

        def make_apply(fast):
            """apply(dst_scr, src_scr, mult): dst = T(src) * mult with the
            block-batched right stage (T is cas-cas or Hartley-pair).
            ``mult=None`` skips the multiply entirely — the inverse-transform
            normalization is folded into ``freq`` host-side, so the second
            transform of each x-update needs no elementwise pass."""
            # perf-audit (see docstring): 'double_convert' repeats every
            # f32->bf16 operand conversion through a non-foldable round-trip,
            # so (variant - full) prices the conversions already on the path
            if ablate == "double_convert":
                def conv(v):
                    b16 = v.astype(jnp.bfloat16)
                    return (b16.astype(jnp.float32) * 1.0000001).astype(jnp.bfloat16)
            else:
                def conv(v):
                    return v.astype(jnp.bfloat16)

            if n_mats == 4:
                th_hi, th_lo, tw_hi, tw_lo = mats
                if fast and ablate == "no_hside":
                    # audit: batched W-stage only — prices the per-plane
                    # H-side loop by subtraction from 'full'
                    def apply(dst, src, mult):
                        flat = conv(src[...].reshape(g * h, w))
                        b = _dot(flat, tw_hi).reshape(g, h, w)
                        for i in range(g):
                            dst[i] = b[i] if mult is None else b[i] * mult

                elif fast and ablate == "no_wside":
                    # audit: per-plane H-stage only
                    def apply(dst, src, mult):
                        b = src[...]
                        for i in range(g):
                            t = _dot(th_hi, conv(b[i]))
                            dst[i] = t if mult is None else t * mult

                elif fast:

                    def apply(dst, src, mult):
                        flat = conv(src[...].reshape(g * h, w))
                        b = _dot(flat, tw_hi).reshape(g, h, w)
                        for i in range(g):
                            t = _dot(th_hi, conv(b[i]))
                            dst[i] = t if mult is None else t * mult

                else:

                    def apply(dst, src, mult):
                        v_hi, v_lo = _split(src[...].reshape(g * h, w))
                        b = _mm3(v_hi, v_lo, tw_hi, tw_lo).reshape(g, h, w)
                        for i in range(g):
                            b_hi, b_lo = _split(b[i])
                            t = _mm3(th_hi, th_lo, b_hi, b_lo)
                            dst[i] = t if mult is None else t * mult

            else:
                (th_hi, th_lo, thp_hi, thp_lo,
                 cw_hi, cw_lo, sw_hi, sw_lo) = mats
                if fast:

                    def apply(dst, src, mult):
                        # left stages per plane into dst/a staging...
                        for i in range(g):
                            vb = src[i].astype(jnp.bfloat16)
                            dst[i] = _dot(th_hi, vb)
                            a_scr[i] = _dot(thp_hi, vb)
                        # ...then two batched right stages
                        t1 = _dot(dst[...].reshape(g * h, w).astype(jnp.bfloat16), cw_hi)
                        t2 = _dot(a_scr[...].reshape(g * h, w).astype(jnp.bfloat16), sw_hi)
                        t12 = (t1 + t2).reshape(g, h, w)
                        dst[...] = t12 if mult is None else t12 * mult

                else:

                    def apply(dst, src, mult):
                        for i in range(g):
                            v_hi, v_lo = _split(src[i])
                            dst[i] = _mm3(th_hi, th_lo, v_hi, v_lo)
                            a_scr[i] = _mm3(thp_hi, thp_lo, v_hi, v_lo)
                        d_hi, d_lo = _split(dst[...].reshape(g * h, w))
                        a_hi, a_lo = _split(a_scr[...].reshape(g * h, w))
                        t1 = _mm3(d_hi, d_lo, cw_hi, cw_lo)
                        t2 = _mm3(a_hi, a_lo, sw_hi, sw_lo)
                        t12 = (t1 + t2).reshape(g, h, w)
                        dst[...] = t12 if mult is None else t12 * mult

            return apply

        # perf-audit ablations (see docstring): identity "roll" keeps the
        # ALU chain but drops the lane/sublane rotations
        roll = (lambda v, s, axis: v) if ablate == "no_roll" else pltpu.roll

        def body_with(apply):
            def body(_, carry):
                # ---- x-update: spectral diagonal solve (MXU) ----
                # freq carries the 1/(H*W) normalization (folded host-side),
                # so the inverse transform needs no elementwise multiply
                apply(y_scr, s_scr, freq)
                apply(t_scr, y_scr, None)
                if ablate == "mxu_only":
                    s_scr[...] = t_scr[...]
                    return carry
                x = t_scr[...]  # (g, H, W) — the fresh primal

                # ---- fused elementwise chain (VPU, all in VMEM) ----
                dx = x - roll(x, 1, axis=2)
                dyv = x - roll(x, 1, axis=1)
                ax = dx + ux_scr[...]
                ay = dyv + uy_scr[...]
                if ablate == "no_shrink":
                    uxn, uyn = ax, ay
                    tx, ty = ax, ay
                elif iso_mode is None:
                    # algebraic regroup of the soft-shrinkage half-iteration:
                    # z = a - clip(a, -tau, tau) (clip-form shrinkage), so the
                    # dual update is u_new = a - z = clip(a, -tau, tau) and
                    # t = z - u_new = a - 2 u_new. z itself is never needed —
                    # one clip + one fused a-2u per branch instead of
                    # clip + three subtractions (same math; a - 2u rounds once
                    # where (a-u)-u rounded twice).
                    uxn = jnp.clip(ax, -tau, tau)
                    uyn = jnp.clip(ay, -tau, tau)
                    tx = ax - 2.0 * uxn
                    ty = ay - 2.0 * uyn
                else:
                    if iso_mode == "sample":
                        nx = jnp.sqrt(jnp.sum(ax * ax, axis=0, keepdims=True) + _EPS)
                        ny = jnp.sqrt(jnp.sum(ay * ay, axis=0, keepdims=True) + _EPS)
                        zx = jnp.maximum(1.0 - tau / (nx + _EPS), 0.0) * ax
                        zy = jnp.maximum(1.0 - tau / (ny + _EPS), 0.0) * ay
                    else:  # 'joint'
                        mag = jnp.sqrt(ax * ax + ay * ay + _EPS)
                        scale = jnp.maximum(1.0 - tau / mag, 0.0)
                        zx = scale * ax
                        zy = scale * ay
                    uxn = ax - zx
                    uyn = ay - zy
                    tx = zx - uxn
                    ty = zy - uyn
                s_scr[...] = hty + rho * (
                    tx
                    - roll(tx, w - 1, axis=2)
                    + ty
                    - roll(ty, h - 1, axis=1)
                )
                ux_scr[...] = uxn
                uy_scr[...] = uyn
                return carry

            return body

        if fast_iters > 0:
            jax.lax.fori_loop(0, fast_iters, body_with(make_apply(fast=True)), 0)
        jax.lax.fori_loop(
            0, maxit - fast_iters, body_with(make_apply(fast=False)), 0
        )
        x_ref[0] = t_scr[...]

    return kernel


def _psf_is_general(kern) -> bool:
    """True when the PSF needs the Hartley-pair (8-matmul) x-update; False
    when the symmetric cas-cas (4-matmul) path is valid."""
    from torch_admm_deconv_tpu.ops.mxu_fft import psf_is_axis_symmetric

    return not psf_is_axis_symmetric(kern)


def _block_ok(h: int, w: int, g: int, general: bool = False) -> bool:
    if h % 8 != 0 or w % 128 != 0:
        return False
    plane = h * w * 4
    # 4 bf16 cas matrices, or 8 on the general-PSF Hartley-pair path
    mats = (4 if general else 2) * 2 * (h * h + w * w)
    # hty + out + 5 scratch + ~3 live temporaries (one more on the general
    # path: the second left-transform product), all (g, H, W), + freq
    return mats + ((11 if general else 10) * g + 1) * plane <= _VMEM_BUDGET_BYTES


def _block_channels(shape, iso: bool, iso_mode: str) -> int:
    return shape[1] if (iso and iso_mode == "sample") else 1


def _fixed_pack(shape, iso: bool, iso_mode: str, general: bool, cap: int = 8) -> int:
    """Planes per grid program for the FIXED-iteration kernel.

    'sample' iso mode must keep exactly the channel grouping (the shrinkage
    norm reduces over the block's plane axis). The elementwise modes (aniso,
    'joint' iso) are semantics-free under packing, so multiple planes share
    a program: the batched (g*H, W) right-stage matmul and the g independent
    left-stage matmuls keep the MXU busier than one plane's 4 serially-
    dependent matmuls (VERDICT r2 weak #3). Picks the largest divisor of
    B*C within ``cap`` whose block (with the batched-stage temporaries,
    ~2 extra plane-blocks) fits the VMEM budget."""
    b, c = shape[0], shape[1]
    if iso and iso_mode == "sample":
        return c
    h, w = shape[-2], shape[-1]
    plane = h * w * 4
    mats = (8 if general else 4) * (h * h + w * w)
    total = b * c
    best = 1
    for g in range(2, min(cap, total) + 1):
        if total % g == 0 and mats + (12 * g + 1) * plane <= _VMEM_BUDGET_BYTES:
            best = g
    return best


def vmem_solve_available(shape, dtype, kern, iso: bool, iso_mode: str) -> bool:
    """True when the whole-solve VMEM kernel supports this configuration:
    f32 NCHW, tile-aligned block that fits the VMEM budget, per-block
    shrinkage (aniso, corrected 'joint' iso, or channel-coupled 'sample'
    iso), and a CONCRETE PSF (or none). Symmetric PSFs ride the 4-matmul
    cas-cas x-update; arbitrary PSFs the 8-matmul Hartley-pair (round 3 —
    previously asymmetric PSFs fell to the scan path; the reference solver
    handles any PSF uniformly, deconv.py:49). Traced (learnable) kernels
    stay on the differentiable scan path. The batch-coupled 'compat' iso
    mode needs a cross-program reduction and stays on the scan path too."""
    if dtype != jnp.float32 or len(shape) != 4:
        return False
    if iso and iso_mode not in ("joint", "sample"):
        return False
    concrete = kern is None or hasattr(kern, "__array__")
    if not concrete:
        return False
    try:
        general = _psf_is_general(kern)
    except Exception:  # traced kernel slipped through: symmetry unknown
        return False
    return _block_ok(
        shape[-2], shape[-1], _block_channels(shape, iso, iso_mode), general
    )


def _make_adaptive_kernel(
    maxit: int,
    iso_mode,
    g: int,
    tol: float,
    rho_mu: float,
    rho_scale: float,
    fast_switch: float = 0.0,
    fast_cap: int = 0,
    return_state: bool = False,
    n_mats: int = 4,
):
    """Residual-stopped, adaptive-rho variant. Stopping and rho adaptation
    are PER BLOCK (per plane, or per sample in 'sample' mode) — each block
    exits its while_loop as soon as its own scaled primal+dual residuals
    (Boyd et al. SS3.3-3.4) fall below tol. The spectrum 1/(|H|^2 + rho|D|^2)
    is rebuilt in-VMEM from the cached |H|^2 / |D|^2 maps whenever rho moves
    (elementwise, no transforms).

    Mixed-precision schedule (inexact ADMM): while both residuals sit above
    ``fast_switch`` (and fewer than ``fast_cap`` iterations have run), the
    x-update matmuls are single-pass bf16 — 3x fewer MXU passes; the final
    approach to ``tol`` always runs the bf16x3 split, and the exit residuals
    are measured from bf16x3 iterates, so the tol contract is unchanged.
    ``fast_cap`` bounds the fast phase in case a block's bf16 noise floor
    sits above ``fast_switch``."""

    def kernel(*refs):
        lmbd_ref, rho0_ref, hty_ref, habs2_ref, d2_ref = refs[:5]
        mat_refs = refs[5 : 5 + n_mats]
        rest = refs[5 + n_mats :]
        if return_state:
            x_ref, zxo_ref, zyo_ref, uxo_ref, uyo_ref = rest[:5]
            iters_ref, r_ref, sres_ref, rhof_ref = rest[5:9]
            scratch = rest[9:]
        else:
            x_ref, iters_ref, r_ref, sres_ref, rhof_ref = rest[:5]
            scratch = rest[5:]
        s_scr, ux_scr, uy_scr, zx_scr, zy_scr, y_scr, t_scr = scratch
        lmbd = lmbd_ref[0, 0]
        rho0 = rho0_ref[0, 0]
        h = hty_ref.shape[-2]
        w = hty_ref.shape[-1]
        hty = hty_ref[0]

        s_scr[...] = hty
        ux_scr[...] = jnp.zeros_like(hty)
        uy_scr[...] = jnp.zeros_like(hty)
        zx_scr[...] = jnp.zeros_like(hty)
        zy_scr[...] = jnp.zeros_like(hty)
        t_scr[...] = jnp.zeros_like(hty)

        mats = tuple(m[...] for m in mat_refs)
        # habs2/d2 arrive pre-scaled by (H*W) so the rebuilt spectrum
        # 1/(habs2 + rho*d2) carries the inverse-transform normalization —
        # no per-iteration full-plane multiply for it
        habs2 = habs2_ref[...]
        d2 = d2_ref[...]
        scale = jnp.sqrt(jnp.float32(2 * g * h * w))

        def body_with(xform):
            def body(carry):
                k, _, _, rho = carry
                freq = 1.0 / (habs2 + rho * d2)
                tau = jnp.maximum(lmbd / rho, 0.0)  # clip-form precondition
                for i in range(g):
                    y_scr[i] = xform(s_scr[i]) * freq
                    t_scr[i] = xform(y_scr[i])
                x = t_scr[...]
                dx = x - pltpu.roll(x, 1, axis=2)
                dyv = x - pltpu.roll(x, 1, axis=1)
                ax = dx + ux_scr[...]
                ay = dyv + uy_scr[...]
                if iso_mode is None:
                    # clip form of soft shrinkage (see fixed kernel)
                    zx = ax - jnp.clip(ax, -tau, tau)
                    zy = ay - jnp.clip(ay, -tau, tau)
                elif iso_mode == "sample":
                    nx = jnp.sqrt(jnp.sum(ax * ax, axis=0, keepdims=True) + _EPS)
                    ny = jnp.sqrt(jnp.sum(ay * ay, axis=0, keepdims=True) + _EPS)
                    zx = jnp.maximum(1.0 - tau / (nx + _EPS), 0.0) * ax
                    zy = jnp.maximum(1.0 - tau / (ny + _EPS), 0.0) * ay
                else:  # 'joint'
                    mag = jnp.sqrt(ax * ax + ay * ay + _EPS)
                    sc = jnp.maximum(1.0 - tau / mag, 0.0)
                    zx = sc * ax
                    zy = sc * ay
                uxn = ax - zx
                uyn = ay - zy

                # scaled residuals (Boyd SS3.3), relative per block
                rx = dx - zx
                ry = dyv - zy
                r = jnp.sqrt(jnp.sum(rx * rx) + jnp.sum(ry * ry)) / scale
                dzx = zx - zx_scr[...]
                dzy = zy - zy_scr[...]
                sdual = rho * (
                    dzx
                    - pltpu.roll(dzx, w - 1, axis=2)
                    + dzy
                    - pltpu.roll(dzy, h - 1, axis=1)
                )
                sd = jnp.sqrt(jnp.sum(sdual * sdual)) / scale

                # residual balancing (Boyd SS3.4.1) + inverse dual rescale.
                # rho_mu is a static Python float; >= 1e29 means "adaptation
                # disabled" and must branch in PYTHON — the runtime inequality
                # r > 1e30*sd still fires when sd == 0 (bitwise-stalled z),
                # which would rescale rho/duals at a point the implicit VJP
                # then wrongly linearizes around (ADVICE r2 finding 1).
                if rho_mu >= 1e29:
                    factor = jnp.float32(1.0)
                else:
                    grow = r > rho_mu * sd
                    shrink = sd > rho_mu * r
                    factor = jnp.where(
                        grow, rho_scale, jnp.where(shrink, 1.0 / rho_scale, 1.0)
                    )
                rho_new = rho * factor
                inv_f = 1.0 / factor

                tx = zx - uxn * inv_f
                ty = zy - uyn * inv_f
                s_scr[...] = hty + rho_new * (
                    tx
                    - pltpu.roll(tx, w - 1, axis=2)
                    + ty
                    - pltpu.roll(ty, h - 1, axis=1)
                )
                ux_scr[...] = uxn * inv_f
                uy_scr[...] = uyn * inv_f
                zx_scr[...] = zx
                zy_scr[...] = zy
                t_scr[...] = x
                return (k + 1, r, sd, rho_new)

            return body

        one = jnp.float32(1.0)
        carry = (jnp.int32(0), one, one, rho0)
        if fast_cap > 0 and fast_switch > tol:

            def fast_cond(c):
                k, r, sd, _ = c
                return jnp.logical_and(
                    k < fast_cap,
                    jnp.logical_or(r > fast_switch, sd > fast_switch),
                )

            carry = jax.lax.while_loop(
                fast_cond, body_with(_make_xform(mats, fast=True)), carry
            )
            # fast-phase residuals carry bf16 measurement noise — force at
            # least one bf16x3 iteration so the exit test is trustworthy
            k0, _, _, rho_c = carry
            carry = (k0, one, one, rho_c)

        def cond(c):
            k, r, sd, _ = c
            return jnp.logical_and(k < maxit, jnp.logical_or(r > tol, sd > tol))

        k, r, sd, rho = jax.lax.while_loop(
            cond, body_with(_make_xform(mats, fast=False)), carry
        )
        x_ref[0] = t_scr[...]
        if return_state:
            # full ADMM state at exit, for the implicit-VJP fixed-point
            # linearization (ops/implicit.py)
            zxo_ref[0] = zx_scr[...]
            zyo_ref[0] = zy_scr[...]
            uxo_ref[0] = ux_scr[...]
            uyo_ref[0] = uy_scr[...]
        pid = pl.program_id(0)
        iters_ref[pid, 0] = k.astype(jnp.float32)
        r_ref[pid, 0] = r
        sres_ref[pid, 0] = sd
        rhof_ref[pid, 0] = rho

    return kernel


def adaptive_vmem_available(
    shape, dtype, kern, iso: bool, iso_mode: str, return_state: bool = False
) -> bool:
    """Eligibility for :func:`admm_tv_adaptive_vmem` — same gates as the
    fixed-iteration kernel plus two extra z-history planes in the budget
    (plus the four exit-state output windows when ``return_state``)."""
    if not vmem_solve_available(shape, dtype, kern, iso, iso_mode):
        return False
    g = _block_channels(shape, iso, iso_mode)
    h, w = shape[-2], shape[-1]
    general = _psf_is_general(kern)
    planes = (16 if return_state else 12) * g + 2 + (1 if general else 0)
    mats = (8 if general else 4) * (h * h + w * w)
    return planes * h * w * 4 + mats <= _VMEM_BUDGET_BYTES


def _split_mats(h: int, w: int, general: bool):
    """Host-side transform matrices as (hi, lo) bf16 split pairs, plus their
    BlockSpec row/col shapes (for pallas in_specs)."""
    from torch_admm_deconv_tpu.ops.mxu_fft import cas_mats, cas_pair_mats

    if general:
        th, thp, cw, sw = cas_pair_mats(h, w)
        raw = (th, thp, cw, sw)
        shapes = [(h, h), (h, h), (w, w), (w, w)]
    else:
        th, tw = cas_mats(h, w)
        raw = (th, tw)
        shapes = [(h, h), (w, w)]
    mats = []
    mat_shapes = []
    for m, shp in zip(raw, shapes):
        hi, lo = _split(m)
        mats += [hi, lo]
        mat_shapes += [shp, shp]
    return tuple(mats), mat_shapes


def admm_tv_adaptive_vmem(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern=None,
    iso: bool = False,
    maxit: int = 500,
    *,
    tol: float = 1e-4,
    iso_mode: str = "sample",
    rho_mu: float = 10.0,
    rho_scale: float = 2.0,
    precision: str = "mixed",
    fast_switch: float | None = None,
    return_state: bool = False,
):
    """Whole-solve-in-VMEM classical TV-ADMM with residual stopping and
    adaptive rho. Unlike :func:`ops.solver.admm_tv_adaptive` (one GLOBAL
    stopping decision over the whole batch), stopping and rho adaptation are
    per block — each plane (or sample, in 'sample' mode) exits as soon as
    its own residuals reach tol, so a batch costs the per-block iteration
    counts rather than batch-size x the worst one.

    ``precision='mixed'`` (default) runs the x-update matmuls single-pass
    bf16 while both residuals sit above ``fast_switch`` (default
    ``max(20*tol, 1e-2)``) and bf16x3 for the final approach to ``tol`` —
    inexact ADMM; the exit residuals are always measured from bf16x3
    iterates, so the tol contract is unchanged. ``precision='high'`` runs
    bf16x3 throughout.

    Returns an ``AdaptiveResult`` whose ``iters``/``r_norm``/``s_norm``/
    ``rho`` are per-block arrays of shape (n_blocks,). With
    ``return_state=True`` returns ``(AdaptiveResult, (x, z_x, z_y, u_x,
    u_y))`` — the full ADMM state at exit, for fixed-point (implicit)
    differentiation.
    """
    # the symmetric-vs-general x-update choice needs a CONCRETE kernel, so
    # it is made eagerly, outside the jitted implementation
    return _admm_tv_adaptive_vmem_impl(
        xin,
        lmbd,
        rho,
        kern,
        iso,
        maxit,
        tol=tol,
        iso_mode=iso_mode,
        rho_mu=rho_mu,
        rho_scale=rho_scale,
        precision=precision,
        fast_switch=fast_switch,
        return_state=return_state,
        general=_psf_is_general(kern),
    )


@partial(
    jax.jit,
    static_argnames=(
        "iso",
        "maxit",
        "iso_mode",
        "tol",
        "rho_mu",
        "rho_scale",
        "precision",
        "fast_switch",
        "return_state",
        "general",
    ),
)
def _admm_tv_adaptive_vmem_impl(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern=None,
    iso: bool = False,
    maxit: int = 500,
    *,
    tol: float = 1e-4,
    iso_mode: str = "sample",
    rho_mu: float = 10.0,
    rho_scale: float = 2.0,
    precision: str = "mixed",
    fast_switch: float | None = None,
    return_state: bool = False,
    general: bool = False,
):
    from torch_admm_deconv_tpu.ops import fdops
    from torch_admm_deconv_tpu.ops.mxu_fft import mirror_freq_full_joint
    from torch_admm_deconv_tpu.ops.solver import AdaptiveResult, _htran

    b, c, h, w = xin.shape
    dtype = xin.dtype
    lmbd = jnp.asarray(lmbd, dtype).reshape(())
    rho = jnp.asarray(rho, dtype).reshape(())

    d2 = fdops.grad_otf_abs2((h, w), dtype)
    if kern is None or kern.size == 0:
        habs2 = jnp.ones((h, w // 2 + 1), dtype)
    else:
        otf = fdops.psf_otf(kern.astype(dtype), (h, w))
        habs2 = (otf.real**2 + otf.imag**2).reshape(h, w // 2 + 1)
    # the conjugate (joint) mirror is exact for any real PSF and coincides
    # with the per-axis mirror for symmetric ones. Both maps are pre-scaled
    # by (H*W) so the in-kernel spectrum rebuild 1/(habs2 + rho*d2) folds in
    # the inverse-transform normalization (see the fixed path) for free.
    hw = jnp.asarray(h * w, dtype)
    habs2_full = mirror_freq_full_joint(habs2, w) * hw
    d2_full = mirror_freq_full_joint(jnp.broadcast_to(d2, (h, w // 2 + 1)), w) * hw

    mats, mat_shapes = _split_mats(h, w, general)

    g = _block_channels(xin.shape, iso, iso_mode)
    n_blocks = (b * c) // g
    hty = _htran(xin, kern, (h, w), dtype).reshape(n_blocks, g, h, w)

    block = pl.BlockSpec((1, g, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    full2d = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    # full-array SMEM blocks (TPU lowering rejects (1,1) sub-blocks of a
    # (n_blocks, 1) array); each program writes its own row by program_id.
    sout = pl.BlockSpec((n_blocks, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    mode = iso_mode if iso else None
    # +4g planes of output-DMA window when the exit state is also written
    planes_resident = (16 if return_state else 12) * g + 2 + (1 if general else 0)
    mats_bytes = (8 if general else 4) * (h * h + w * w)
    vmem_limit = min(
        128 * 1024 * 1024,
        int((planes_resident * h * w * 4 + mats_bytes) * 1.25) + 16 * 1024 * 1024,
    )
    if precision == "mixed":
        switch = float(fast_switch) if fast_switch is not None else max(20.0 * tol, 1e-2)
        fast_cap = maxit - max(8, maxit // 8)
    elif precision == "high":
        switch, fast_cap = 0.0, 0
    else:
        raise ValueError(f"precision must be 'mixed' or 'high', got {precision!r}")

    scalar_out = jax.ShapeDtypeStruct((n_blocks, 1), jnp.float32)
    plane_out = jax.ShapeDtypeStruct((n_blocks, g, h, w), dtype)
    n_state = 5 if return_state else 1
    outs = pl.pallas_call(
        _make_adaptive_kernel(
            maxit,
            mode,
            g,
            float(tol),
            float(rho_mu),
            float(rho_scale),
            fast_switch=switch,
            fast_cap=fast_cap,
            return_state=return_state,
            n_mats=len(mats),
        ),
        grid=(n_blocks,),
        in_specs=[
            sspec,
            sspec,
            block,
            full2d(h, w),
            full2d(h, w),
        ]
        + [full2d(*shp) for shp in mat_shapes],
        out_specs=[block] * n_state + [sout] * 4,
        out_shape=[plane_out] * n_state + [scalar_out] * 4,
        scratch_shapes=[pltpu.VMEM((g, h, w), jnp.float32)] * 7,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=jax.default_backend() != "tpu",
    )(
        lmbd.reshape(1, 1),
        rho.reshape(1, 1),
        hty,
        habs2_full,
        d2_full,
        *mats,
    )
    planes, (iters, r, sd, rho_f) = outs[:n_state], outs[n_state:]
    result = AdaptiveResult(
        x=planes[0].reshape(b, c, h, w),
        iters=iters.reshape(n_blocks).astype(jnp.int32),
        r_norm=r.reshape(n_blocks),
        s_norm=sd.reshape(n_blocks),
        rho=rho_f.reshape(n_blocks),
    )
    if return_state:
        state = tuple(p.reshape(b, c, h, w) for p in planes)
        return result, state
    return result


def admm_tv_vmem(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern=None,
    iso: bool = False,
    maxit: int = 100,
    *,
    iso_mode: str = "joint",
    precision: str = "high",
    fast_frac: float = 0.75,
    schedule: str = "batched",
    _ablate: str = "",
) -> jnp.ndarray:
    """Whole-solve-in-VMEM TV-ADMM. Same contract as ops.solver.admm_tv for
    the configurations :func:`vmem_solve_available` accepts; callers are
    expected to gate on it (admm_tv does this automatically when
    ``use_pallas=True``).

    ``schedule='interleaved'`` runs each plane's full iteration (matmuls +
    elementwise) before the next plane's, letting Mosaic overlap MXU and
    VPU work across planes (see :func:`_make_interleaved_kernel`); only
    valid for the per-plane shrinkage modes (aniso / 'joint'), falls back
    to 'batched' otherwise.

    ``precision='mixed'`` opts in to the inexact-ADMM schedule: the first
    ``fast_frac`` of the iterations run single-pass bf16 x-update matmuls,
    the remainder the bf16x3 split. The fixed point is unchanged — early
    roundoff is contracted away by the exact tail — but intermediate
    iterates differ from the scan path, so it is NOT the default (parity).
    ``fast_frac`` trades MXU passes for tail length (deviation study:
    scripts/bench_mixed_precision.py)."""
    # symmetric-vs-general decision needs a concrete kernel: made eagerly
    return _admm_tv_vmem_impl(
        xin, lmbd, rho, kern, iso, maxit,
        iso_mode=iso_mode, precision=precision, fast_frac=float(fast_frac),
        schedule=schedule, general=_psf_is_general(kern), ablate=_ablate,
    )


@partial(
    jax.jit,
    static_argnames=(
        "iso", "maxit", "iso_mode", "precision", "fast_frac", "schedule", "general",
        "ablate",
    ),
)
def _admm_tv_vmem_impl(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern=None,
    iso: bool = False,
    maxit: int = 100,
    *,
    iso_mode: str = "joint",
    precision: str = "high",
    fast_frac: float = 0.75,
    schedule: str = "batched",
    general: bool = False,
    ablate: str = "",
) -> jnp.ndarray:
    from torch_admm_deconv_tpu.ops import fdops
    from torch_admm_deconv_tpu.ops.mxu_fft import mirror_freq_full_joint
    from torch_admm_deconv_tpu.ops.solver import _htran

    b, c, h, w = xin.shape
    dtype = xin.dtype
    lmbd = jnp.asarray(lmbd, dtype).reshape(())
    rho = jnp.asarray(rho, dtype).reshape(())
    # tau >= 0 precondition of the clip-form shrinkage (a - clip(a, -tau, tau)
    # is only soft-thresholding for non-negative tau; jnp.clip with min > max
    # would silently return tau — ADVICE r3)
    tau = jnp.maximum(lmbd / rho, 0.0)

    freq_c = fdops.freq_denominator((h, w), rho, kern, dtype)
    # Fold the inverse-transform 1/(H*W) normalization into the diagonal
    # spectrum: x = T((freq/HW) * T(s)) == T(freq * T(s))/HW (the spectrum is
    # diagonal, scalars commute). Kills one full-plane VPU multiply per
    # iteration from the kernel's dependent elementwise chain — the confirmed
    # MFU bound (benchmarks/mfu_trace_r4.md: 4.6 us VPU vs 4.1 us MXU).
    freq_c = freq_c * (1.0 / (h * w))
    freq_full = mirror_freq_full_joint(jnp.broadcast_to(freq_c, (h, w // 2 + 1)), w)
    mats, mat_shapes = _split_mats(h, w, general)

    g = _fixed_pack(xin.shape, iso, iso_mode, general)
    n_blocks = (b * c) // g
    hty = _htran(xin, kern, (h, w), dtype).reshape(n_blocks, g, h, w)

    block = pl.BlockSpec((1, g, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    full2d = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    mode = iso_mode if iso else None
    mats_bytes = (8 if general else 4) * (h * h + w * w)
    # 5/6 scratch + hty + out + batched-stage temporaries, all (g, H, W)
    planes_resident = (13 if general else 12) * g + 1
    vmem_limit = min(
        128 * 1024 * 1024,
        int((planes_resident * h * w * 4 + mats_bytes) * 1.25) + 16 * 1024 * 1024,
    )
    if precision == "mixed":
        # clamp both ends: a negative fast_frac must not push the exact-phase
        # fori_loop past maxit (ADVICE r3), a >1 frac must not skip it
        fast_iters = max(0, min(int(fast_frac * maxit), maxit))
    elif precision == "high":
        fast_iters = 0
    else:
        raise ValueError(f"precision must be 'mixed' or 'high', got {precision!r}")
    interleaved = schedule == "interleaved" and mode in (None, "joint")
    if interleaved:
        kernel_fn = _make_interleaved_kernel(
            maxit, mode, g, fast_iters=fast_iters, n_mats=len(mats)
        )
        n_scratch = 3
    else:
        kernel_fn = _make_kernel(maxit, mode, g, fast_iters=fast_iters,
                                 n_mats=len(mats), ablate=ablate)
        n_scratch = 6 if general else 5
    out = pl.pallas_call(
        kernel_fn,
        grid=(n_blocks,),
        in_specs=[
            sspec,
            sspec,
            block,
            full2d(h, w),
        ]
        + [full2d(*shp) for shp in mat_shapes],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((n_blocks, g, h, w), dtype),
        scratch_shapes=[pltpu.VMEM((g, h, w), jnp.float32)] * n_scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=jax.default_backend() != "tpu",
    )(
        rho.reshape(1, 1),
        tau.reshape(1, 1),
        hty,
        freq_full,
        *mats,
    )
    return out.reshape(b, c, h, w)
