"""Pallas TPU kernel: one fused HBM pass for the ADMM elementwise chain.

Per solver iteration, everything between the inverse FFT and the next forward
FFT is elementwise + one-pixel circular shifts:

    dx, dy   = D x                      (rolls)
    z        = shrink(d + u, tau)       (prox)
    u'       = (d + u) - z              (dual ascent)
    s'       = H^T y + rho * (Dx^T(z_x - u'_x) + Dy^T(z_y - u'_y))

XLA fuses most of this already; this kernel guarantees the whole chain is a
single pass — 4 reads (x, u_x, u_y, hty) and 3 writes (s, u'_x, u'_y) of
B*C*H*W floats, the HBM-bandwidth speed of light for the iteration's
non-FFT work (BASELINE.json north star). Shifts use ``pltpu.roll`` inside
VMEM, so nothing spills.

Grid: one program per image plane (B*C flattened) for anisotropic/joint
modes; one program per sample (full C block) for the channel-coupled
per-sample isotropic mode. Falls back to the XLA path (solver default) when
a plane does not fit the VMEM budget or is not tile-aligned — the wrapper
reports availability via :func:`fused_step_available`.

The reference has no analog: its iteration is ~10 separate torch CUDA kernel
launches (deconv.py:103-115).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-15
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
# buffers resident per program: 4 inputs + 3 outputs + ~3 live temporaries
_BUFFERS = 10


def _make_kernel(iso_mode):
    """iso_mode: None (anisotropic soft), 'sample', or 'joint'."""

    def kernel(rho_ref, tau_ref, x_ref, ux_ref, uy_ref, hty_ref, s_ref, uxo_ref, uyo_ref):
        rho = rho_ref[0, 0]
        tau = tau_ref[0, 0]
        x = x_ref[...]
        dx = x - pltpu.roll(x, 1, axis=x.ndim - 1)
        dy = x - pltpu.roll(x, 1, axis=x.ndim - 2)
        ax = dx + ux_ref[...]
        ay = dy + uy_ref[...]

        if iso_mode is None:
            # clip form of soft shrinkage: sign(a)*max(|a|-tau, 0)
            # == a - clip(a, -tau, tau) exactly (3 VPU ops vs 5)
            zx = ax - jnp.clip(ax, -tau, tau)
            zy = ay - jnp.clip(ay, -tau, tau)
        elif iso_mode == "sample":
            # block is (1, C, H, W): couple across the channel axis
            nx = jnp.sqrt(jnp.sum(ax * ax, axis=1, keepdims=True) + _EPS)
            ny = jnp.sqrt(jnp.sum(ay * ay, axis=1, keepdims=True) + _EPS)
            zx = jnp.maximum(1.0 - tau / (nx + _EPS), 0.0) * ax
            zy = jnp.maximum(1.0 - tau / (ny + _EPS), 0.0) * ay
        elif iso_mode == "joint":
            mag = jnp.sqrt(ax * ax + ay * ay + _EPS)
            scale = jnp.maximum(1.0 - tau / mag, 0.0)
            zx = scale * ax
            zy = scale * ay
        else:  # pragma: no cover
            raise ValueError(iso_mode)

        uxo = ax - zx
        uyo = ay - zy
        # z - u' folded: t = z - (a - z) = 2z - a
        tx = zx - uxo
        ty = zy - uyo
        # adjoint shifts are -1 rolls; pltpu.roll needs non-negative shifts
        s = hty_ref[...] + rho * (
            tx
            - pltpu.roll(tx, tx.shape[-1] - 1, axis=tx.ndim - 1)
            + ty
            - pltpu.roll(ty, ty.shape[-2] - 1, axis=ty.ndim - 2)
        )
        s_ref[...] = s
        uxo_ref[...] = uxo
        uyo_ref[...] = uyo

    return kernel


def _plane_block(shape, iso_mode):
    """(collapsed input shape, block shape, grid) for the kernel, or None."""
    b, c, h, w = shape
    if iso_mode == "sample":
        collapsed = (b, c, h, w)
        block = (1, c, h, w)
        grid = (b,)
    else:
        collapsed = (b * c, h, w)
        block = (1, h, w)
        grid = (b * c,)
    if math.prod(block) * 4 * _BUFFERS > _VMEM_BUDGET_BYTES:
        return None
    if h % 8 != 0 or w % 128 != 0:
        return None
    return collapsed, block, grid


def fused_step_available(shape, dtype, iso: bool, iso_mode: str) -> bool:
    """True when the fused Pallas step supports this configuration."""
    if dtype != jnp.float32 or len(shape) != 4:
        return False
    if iso and iso_mode == "compat":
        return False  # batch-coupled norm needs a cross-program reduction
    mode = iso_mode if iso else None
    return _plane_block(shape, mode) is not None


def fused_elementwise_step(x, u_x, u_y, hty, rho, tau, iso, iso_mode):
    """Drop-in for solver._elementwise_step (z outputs elided — the scan
    discards them). Falls back to nothing: caller checks availability."""
    mode = iso_mode if iso else None
    if mode == "compat":
        raise ValueError("fused step does not support the batch-coupled compat iso mode")
    shape = x.shape
    plan = _plane_block(shape, mode)
    if plan is None:
        # shape/VMEM fallback: plain XLA chain
        from torch_admm_deconv_tpu.ops.solver import _elementwise_step

        return _elementwise_step(x, u_x, u_y, hty, rho, tau, iso, iso_mode)
    collapsed, block, grid = plan

    def reshape_in(a):
        return a.reshape(collapsed)

    n_block_dims = len(block)
    index_map = lambda i: (i,) + (0,) * (n_block_dims - 1)  # noqa: E731
    vspec = pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    rho_arr = jnp.asarray(rho, jnp.float32).reshape(1, 1)
    # tau >= 0: the kernel's clip-form shrinkage (a - clip(a, -tau, tau))
    # requires a non-negative threshold; jnp.clip with min > max would return
    # tau everywhere — a silent semantic change (ADVICE r3)
    tau_arr = jnp.maximum(jnp.asarray(tau, jnp.float32), 0.0).reshape(1, 1)

    out_shape = [jax.ShapeDtypeStruct(collapsed, x.dtype)] * 3
    interpret = jax.default_backend() != "tpu"
    s, uxo, uyo = pl.pallas_call(
        _make_kernel(mode),
        grid=grid,
        in_specs=[sspec, sspec, vspec, vspec, vspec, vspec],
        out_specs=[vspec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(rho_arr, tau_arr, reshape_in(x), reshape_in(u_x), reshape_in(u_y), reshape_in(hty))
    return s.reshape(shape), None, None, uxo.reshape(shape), uyo.reshape(shape)
