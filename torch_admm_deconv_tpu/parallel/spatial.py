"""Spatially-sharded TV-ADMM for megapixel images (shard_map + ICI).

Beyond-reference capability (BASELINE.json config 5, SURVEY.md §2.5/§5):
the image's H dimension shards over the ``space`` mesh axis; each iteration
needs two cross-shard structures:

* **halo exchange** — the one-pixel circular shifts of Dy/Dy^T move a single
  boundary row between neighbouring shards via ``lax.ppermute`` (rides ICI);
* **distributed FFT** — the x-update's rfft2 is global. Pencil
  decomposition: local rfft along W, ``lax.all_to_all`` transpose so H
  becomes local (the rfft frequency axis is zero-padded to a multiple of the
  shard count), local fft along H, the diagonal freq_c multiply on the
  shard's own frequency columns (closed-form OTFs evaluated per column — no
  replicated full-grid arrays), then the inverse chain. Two all_to_alls per
  direction, 4 per iteration.

Residual norms reduce with ``lax.psum`` over the same axis so all shards
agree on stopping and adaptive rho jointly.

Everything here runs inside ``jax.shard_map`` and is exercised on a virtual
8-device CPU mesh by tests/test_spatial.py; the math is validated against
the single-device solver bit-for-bit (same FFT plan modulo reordering).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from torch_admm_deconv_tpu.ops.prox import block_thresh_joint, soft_thresh
from torch_admm_deconv_tpu.ops.solver import AdaptiveResult

# ---------------------------------------------------------------------------
# halo exchange: sharded one-row circular shifts along H
# ---------------------------------------------------------------------------


def _shift_rows(x: jnp.ndarray, direction: int, axis_name: str, n: int) -> jnp.ndarray:
    """Global circular roll of the H axis by +-1 for an H-sharded block:
    exchange one boundary row with the neighbouring shard via ppermute."""
    if direction == +1:  # roll down: row comes from the previous shard
        row = x[..., -1:, :]
        perm = [(i, (i + 1) % n) for i in range(n)]
        recv = jax.lax.ppermute(row, axis_name, perm)
        return jnp.concatenate([recv, x[..., :-1, :]], axis=-2)
    else:  # roll up: row comes from the next shard
        row = x[..., :1, :]
        perm = [(i, (i - 1) % n) for i in range(n)]
        recv = jax.lax.ppermute(row, axis_name, perm)
        return jnp.concatenate([x[..., 1:, :], recv], axis=-2)


def _halo_exchange(v: jnp.ndarray, m: int, axis_name: str, n: int) -> jnp.ndarray:
    """Pad an H-sharded block with ``m`` rows from each circular neighbour:
    (..., H/n, W) -> (..., H/n + 2m, W). The top margin is the previous
    shard's last m rows, the bottom margin the next shard's first m rows —
    the globally-correct circular context for a local solve. (At n=1 the
    permutation is the identity and the pad is the block's own wrap; the
    padded problem is still an (H+2m)-periodic circulant, so the margin
    truncation error remains — it just decays exponentially in m.)"""
    top = jax.lax.ppermute(
        v[..., -m:, :], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    bot = jax.lax.ppermute(
        v[..., :m, :], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    return jnp.concatenate([top, v, bot], axis=-2)


def dy_sharded(x, axis_name, n):
    return x - _shift_rows(x, +1, axis_name, n)


def dy_t_sharded(a, axis_name, n):
    return a - _shift_rows(a, -1, axis_name, n)


def dx_local(x):
    return x - jnp.roll(x, 1, axis=-1)


def dx_t_local(a):
    return a - jnp.roll(a, -1, axis=-1)


# ---------------------------------------------------------------------------
# pencil-decomposed distributed FFT
# ---------------------------------------------------------------------------


def _wf_pad(w: int, n: int) -> Tuple[int, int]:
    wf = w // 2 + 1
    return wf, (-wf) % n


def rfft2_sharded(x: jnp.ndarray, axis_name: str, n: int, w: int) -> jnp.ndarray:
    """(B, C, H/n, W) real, H-sharded -> (B, C, H, wf_pad/n) complex,
    frequency-column-sharded."""
    xf = jnp.fft.rfft(x, axis=-1)
    wf, pad = _wf_pad(w, n)
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, 0), (0, pad)))
    xf = jax.lax.all_to_all(xf, axis_name, split_axis=3, concat_axis=2, tiled=True)
    return jnp.fft.fft(xf, axis=-2)


def irfft2_sharded(
    xf: jnp.ndarray, axis_name: str, n: int, h_local: int, w: int
) -> jnp.ndarray:
    """Inverse of :func:`rfft2_sharded`: back to (B, C, H/n, W) real."""
    xf = jnp.fft.ifft(xf, axis=-2)
    xf = jax.lax.all_to_all(xf, axis_name, split_axis=2, concat_axis=3, tiled=True)
    wf, _ = _wf_pad(w, n)
    xf = xf[..., :wf]
    return jnp.fft.irfft(xf, n=w, axis=-1)


# -- MXU matmul-DFT pencil path ---------------------------------------------
# On TPU the per-shard 1-D transforms run as MXU matmuls (the same ~14x
# x-update win as ops/mxu_fft.py documents for the single-chip path); the
# complex values travel as a stacked (2, ...) real array so each transpose
# stays ONE all_to_all of the same byte volume as the complex64 form.


def rfft2_sharded_mxu(x: jnp.ndarray, axis_name: str, n: int, w: int, mats):
    """(B, C, H/n, W) real, H-sharded -> (Yr, Yi) each (B, C, H, wf_pad/n),
    frequency-column-sharded."""
    from torch_admm_deconv_tpu.ops.mxu_fft import fft_h_stage, rfft_w_stage

    cw, sw, ch, sh, _, _ = mats
    xr, xi = rfft_w_stage(x, cw, sw)
    z = jnp.stack([xr, xi])  # (2, B, C, H/n, wf)
    _, pad = _wf_pad(w, n)
    if pad:
        z = jnp.pad(z, ((0, 0),) * 4 + ((0, pad),))
    z = jax.lax.all_to_all(z, axis_name, split_axis=4, concat_axis=3, tiled=True)
    return fft_h_stage(z[0], z[1], ch, sh)


def irfft2_sharded_mxu(
    yr: jnp.ndarray, yi: jnp.ndarray, axis_name: str, n: int, h: int, w: int, mats
) -> jnp.ndarray:
    """Inverse of :func:`rfft2_sharded_mxu`: back to (B, C, H/n, W) real."""
    from torch_admm_deconv_tpu.ops.mxu_fft import ifft_h_stage, irfft_w_stage

    _, _, ch, sh, icw, isw = mats
    zr, zi = ifft_h_stage(yr, yi, ch, sh, h)
    z = jnp.stack([zr, zi])  # (2, B, C, H, wf_pad/n)
    z = jax.lax.all_to_all(z, axis_name, split_axis=3, concat_axis=4, tiled=True)
    wf, _ = _wf_pad(w, n)
    return irfft_w_stage(z[0][..., :wf], z[1][..., :wf], icw, isw)


def _resolve_spatial_fft_impl(fft_impl: str, kern) -> str:
    """'auto' -> MXU matmul pencil stages on TPU, XLA FFT elsewhere. The
    Hartley ('dht') form needs both +-kx columns on one shard, which the
    pencil decomposition splits — it degrades to 'mxu' here."""
    from torch_admm_deconv_tpu.ops.solver import _resolve_fft_impl

    impl = _resolve_fft_impl(fft_impl, kern)
    return "mxu" if impl == "dht" else impl


def _make_sharded_freq_ops(impl: str, axis_name: str, n: int, h: int, w: int,
                           h_local: int):
    """(forward, inverse, scale-by-real, multiply-by-conj) for either pencil
    implementation, hiding the complex64 vs (real, imag)-pair representation."""
    if impl == "mxu":
        from torch_admm_deconv_tpu.ops.mxu_fft import dft_mats

        mats = dft_mats(h, w)
        fwd = lambda v: rfft2_sharded_mxu(v, axis_name, n, w, mats)  # noqa: E731
        inv = lambda p: irfft2_sharded_mxu(p[0], p[1], axis_name, n, h, w, mats)  # noqa: E731
        mul_real = lambda p, c: (c * p[0], c * p[1])  # noqa: E731

        def mul_conj(p, otf):
            otf_r, otf_i = otf.real, otf.imag
            return (otf_r * p[0] + otf_i * p[1], otf_r * p[1] - otf_i * p[0])

        return fwd, inv, mul_real, mul_conj
    fwd = lambda v: rfft2_sharded(v, axis_name, n, w)  # noqa: E731
    inv = lambda xf: irfft2_sharded(xf, axis_name, n, h_local, w)  # noqa: E731
    mul_real = lambda xf, c: c * xf  # noqa: E731
    mul_conj = lambda xf, otf: jnp.conj(otf) * xf  # noqa: E731
    return fwd, inv, mul_real, mul_conj


# ---------------------------------------------------------------------------
# halo-margin local x-update (comm diet — SURVEY §7 hard part (a))
# ---------------------------------------------------------------------------
# The pencil path is exact but pays 2 all_to_all transposes per iteration and
# forces complex (2x) matmul stages. The circulant operator
# (|H_hat|^2 + rho |D_hat|^2)^-1 has an exponentially-decaying spatial kernel,
# so the x-update can instead be solved LOCALLY on the shard's block padded
# with ``halo`` rows of true neighbour data (one ppermute pair, 2m*W rows of
# traffic vs the transpose's H/n*W), discarding the margins. The local padded
# solve reuses the single-device x-update machinery — including the Hartley
# (dht) path the pencil decomposition cannot use — so single-device overhead
# is only (H/n + 2m)/(H/n) extra FFT rows. Error decays ~exp(-m/l) with
# decay length l ~ 1/acosh(1 + 1/(2 rho)) rows (validated against the
# unsharded oracle in tests/test_spatial.py).


def _make_local_freq_solver(fft_impl: str, shape: Tuple[int, int]):
    """(s, freq_c) -> x local circulant solve with precomputed DFT mats, so
    adaptive-rho loops can rebuild freq_c per iteration without rebuilding
    the transform matrices."""
    if fft_impl == "dht":
        from torch_admm_deconv_tpu.ops.mxu_fft import (
            cas_mats,
            freq_solve_dht,
            mirror_freq_full,
        )

        mats = cas_mats(*shape)
        return lambda s, fc: freq_solve_dht(s, mirror_freq_full(fc, shape[1]), mats)
    if fft_impl == "mxu":
        from torch_admm_deconv_tpu.ops.mxu_fft import dft_mats, freq_solve_mxu

        mats = dft_mats(*shape)
        return lambda s, fc: freq_solve_mxu(s, fc, mats)

    def xla_solve(s, fc):
        return jnp.fft.irfft2(fc * jnp.fft.rfft2(s, axes=(-2, -1)), s=shape, axes=(-2, -1))

    return xla_solve


def _make_halo_ops(kern, *, fft_impl, axis_name, n, h_local, w, halo, dtype):
    """Returns (x_update(s, freq_c), habs2, d2, hty_fn) for the halo-margin
    local solve on the (h_local + 2*halo, w) padded block. ``freq_c`` must be
    built on that padded grid: 1 / (habs2 + rho * d2)."""
    from torch_admm_deconv_tpu.ops import fdops

    assert 0 < halo <= h_local, f"halo={halo} must be in (0, H/n={h_local}]"
    h_pad = h_local + 2 * halo
    shape = (h_pad, w)
    solve = _make_local_freq_solver(fft_impl, shape)

    if kern is None or kern.size == 0:
        habs2 = jnp.ones((), dtype)
        hty_fn = lambda v: v  # noqa: E731
    else:
        otf_c = fdops.psf_otf_centered(kern.astype(dtype), shape)
        # Collapse the kernel's leading (1, 1) dims: freq_c = 1/(habs2 + rho*d2)
        # must stay a 2-D (H_pad, Wf) grid so the Hartley path's
        # mirror_freq_full (which slices axis 1 as the frequency axis) sees the
        # spectrum, not a broadcast batch dim (matches _admm_tv_vmem_impl's
        # reshape in kernels/vmem_solver.py).
        habs2 = (
            (otf_c.real**2 + otf_c.imag**2)
            .reshape(h_pad, w // 2 + 1)
            .astype(dtype)
        )

        def hty_fn(v):
            v_pad = _halo_exchange(v, halo, axis_name, n)
            full = fdops.htran_fft(v_pad, otf_c, shape)
            return full[..., halo : halo + h_local, :]

    d2 = fdops.grad_otf_abs2(shape, dtype)

    def x_update(s, freq_c):
        s_pad = _halo_exchange(s, halo, axis_name, n)
        x_pad = solve(s_pad, freq_c)
        return x_pad[..., halo : halo + h_local, :]

    return x_update, habs2, d2, hty_fn


# ---------------------------------------------------------------------------
# closed-form per-column frequency grids (no replicated full-size arrays)
# ---------------------------------------------------------------------------


def _my_cols(axis_name: str, n: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """This shard's rfft frequency-column indices (padded grid) + validity."""
    wf, pad = _wf_pad(w, n)
    chunk = (wf + pad) // n
    base = jax.lax.axis_index(axis_name) * chunk
    kx = base + jnp.arange(chunk)
    return kx, kx < wf


def grad_abs2_cols(h: int, w: int, kx: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """|Dx_hat|^2 + |Dy_hat|^2 on (H, cols): 4 sin^2 closed form
    (same math as ops.fdops.grad_otf_abs2)."""
    ky = jnp.arange(h, dtype=dtype)
    sy2 = 4.0 * jnp.sin(jnp.pi * ky / h) ** 2
    sx2 = 4.0 * jnp.sin(jnp.pi * kx.astype(dtype) / w) ** 2
    return sy2[:, None] + sx2[None, :]


def psf_otf_centered_cols(
    kern: jnp.ndarray, h: int, w: int, kx: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Centered PSF OTF evaluated directly on (H, cols) via the small-kernel
    DFT sum — cost kh*kw*H*cols, no full-grid FFT (matches
    ops.fdops.psf_otf_centered exactly on the owned columns)."""
    kh, kw = int(kern.shape[-2]), int(kern.shape[-1])
    top, left = (kh - 1) // 2, (kw - 1) // 2
    k = kern.reshape(kh, kw).astype(dtype)
    a = jnp.arange(kh, dtype=dtype) - top
    b = jnp.arange(kw, dtype=dtype) - left
    ky = jnp.arange(h, dtype=dtype)
    # phase_y: (kh, H), phase_x: (kw, cols)
    py = jnp.exp(-2j * jnp.pi * a[:, None] * ky[None, :] / h)
    px = jnp.exp(-2j * jnp.pi * b[:, None] * kx.astype(dtype)[None, :] / w)
    return jnp.einsum("ab,ay,bx->yx", k.astype(py.dtype), py, px)


# ---------------------------------------------------------------------------
# the sharded solvers
# ---------------------------------------------------------------------------


def _shrink(dxu, dyu, tau, iso: bool, iso_mode: str):
    """Shrinkage for H-sharded blocks. compat/sample norms reduce over
    (B, C) / (C,), which stay fully local under spatial sharding, so the
    single-device semantics carry over unchanged."""
    if not iso:
        return soft_thresh(dxu, tau), soft_thresh(dyu, tau)
    if iso_mode in ("compat", "sample"):
        axis = (0, 1) if iso_mode == "compat" else (1,)
        norm_x = jnp.sqrt(jnp.sum(dxu * dxu, axis=axis, keepdims=True) + 1e-15)
        norm_y = jnp.sqrt(jnp.sum(dyu * dyu, axis=axis, keepdims=True) + 1e-15)
        zx = jnp.maximum(1.0 - tau / (norm_x + 1e-15), 0.0) * dxu
        zy = jnp.maximum(1.0 - tau / (norm_y + 1e-15), 0.0) * dyu
        return zx, zy
    if iso_mode == "joint":
        return block_thresh_joint(dxu, dyu, tau)
    raise ValueError(iso_mode)


def _local_fixed_solver(
    xin, lmbd, rho, kern, *, axis_name, n, h, w, iso, iso_mode, maxit, fft_impl,
    x_update_mode="pencil", halo=32
):
    dtype = xin.dtype
    h_local = xin.shape[-2]
    lmbd = jnp.reshape(lmbd, ()).astype(dtype)
    rho = jnp.reshape(rho, ()).astype(dtype)
    tau = lmbd / rho

    if x_update_mode == "halo":
        x_up, h_abs2, d2p, hty_fn = _make_halo_ops(
            kern, fft_impl=fft_impl, axis_name=axis_name, n=n,
            h_local=h_local, w=w, halo=halo, dtype=dtype,
        )
        hty = hty_fn(xin)
        freq_c = 1.0 / (h_abs2 + rho * d2p)
        solve_x = lambda s: x_up(s, freq_c)  # noqa: E731
    else:
        fwd, inv, mul_real, mul_conj = _make_sharded_freq_ops(
            fft_impl, axis_name, n, h, w, h_local
        )
        kx, valid = _my_cols(axis_name, n, w)
        d2 = grad_abs2_cols(h, w, kx, dtype)
        if kern is None or kern.size == 0:
            h_abs2 = jnp.ones((), dtype)
            hty = xin
        else:
            otf_c = psf_otf_centered_cols(kern, h, w, kx, dtype)
            h_abs2 = (otf_c.real**2 + otf_c.imag**2).astype(dtype)
            hty = inv(mul_conj(fwd(xin), otf_c))
        denom = h_abs2 + rho * d2
        freq_c = jnp.where(valid[None, :], 1.0 / denom, 0.0)
        solve_x = lambda s: inv(mul_real(fwd(s), freq_c))  # noqa: E731

    zeros = jnp.zeros_like(xin)

    def step(carry, _):
        s, u_x, u_y, _ = carry
        x = solve_x(s)
        dxk = dx_local(x)
        dyk = dy_sharded(x, axis_name, n)
        z_x, z_y = _shrink(dxk + u_x, dyk + u_y, tau, iso, iso_mode)
        u_x = u_x + dxk - z_x
        u_y = u_y + dyk - z_y
        s_new = hty + rho * (dx_t_local(z_x - u_x) + dy_t_sharded(z_y - u_y, axis_name, n))
        return (s_new, u_x, u_y, x), None

    (_, _, _, x_f), _ = jax.lax.scan(step, (hty, zeros, zeros, zeros), None, length=maxit)
    return x_f


def spatial_admm_tv(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern: Optional[jnp.ndarray] = None,
    iso: bool = False,
    maxit: int = 100,
    *,
    mesh: Mesh,
    axis: str = "space",
    iso_mode: str = "compat",
    fft_impl: str = "auto",
    x_update_mode: str = "pencil",
    halo: int = 32,
) -> jnp.ndarray:
    """Fixed-iteration TV-ADMM with the image spatially tiled over ``axis``.

    ``xin``: (B, C, H, W) with H divisible by the axis size.

    ``x_update_mode``: 'pencil' (default) runs the exact distributed-FFT
    x-update (2 all_to_all transposes/iteration) and matches
    :func:`ops.solver.admm_tv` to fp tolerance; 'halo' solves the x-update
    locally on a ``halo``-row padded block (one ppermute pair/iteration,
    single-device-optimal local transforms incl. the Hartley path) with
    error that decays exponentially in ``halo``.
    """
    n = mesh.shape[axis]
    b, c, h, w = xin.shape
    assert h % n == 0, f"H={h} must divide over {n} spatial shards"
    kern_arr = None if kern is None or kern.size == 0 else jnp.asarray(kern)

    if x_update_mode == "halo":
        from torch_admm_deconv_tpu.ops.solver import _resolve_fft_impl

        impl = _resolve_fft_impl(fft_impl, kern_arr)  # dht usable locally
    else:
        impl = _resolve_spatial_fft_impl(fft_impl, kern_arr)
    jitted = _fixed_sharded_fn(
        mesh, axis, n, h, w, iso, iso_mode, maxit, impl, x_update_mode, halo,
        kern_arr is not None,
    )
    args = (xin, jnp.asarray(lmbd, xin.dtype), jnp.asarray(rho, xin.dtype)) + (
        (kern_arr,) if kern_arr is not None else ()
    )
    return jitted(*args)


@lru_cache(maxsize=64)
def _fixed_sharded_fn(mesh, axis, n, h, w, iso, iso_mode, maxit, impl,
                      x_update_mode, halo, has_kern):
    """Build-and-jit the sharded fixed solver ONCE per static config: a fresh
    `jax.jit(shard_map(...))` per call would re-trace every invocation (the
    round-4 spatial TPU A/B initially measured that tracing as a 10-21x
    "overhead"); module-level caching matches the unsharded solver's
    `@partial(jax.jit, static_argnames=...)` behaviour."""
    body = partial(
        _local_fixed_solver,
        axis_name=axis,
        n=n,
        h=h,
        w=w,
        iso=iso,
        iso_mode=iso_mode,
        maxit=maxit,
        fft_impl=impl,
        x_update_mode=x_update_mode,
        halo=halo,
    )
    spec_x = P(None, None, axis, None)
    spec_s = P()
    in_specs = (spec_x, spec_s, spec_s) + ((spec_s,) if has_kern else ())
    if has_kern:
        fn = lambda x_, l_, r_, k_: body(x_, l_, r_, k_)  # noqa: E731
    else:
        fn = lambda x_, l_, r_: body(x_, l_, r_, None)  # noqa: E731
    sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=spec_x)
    return jax.jit(sharded)


def spatial_admm_tv_adaptive(
    xin: jnp.ndarray,
    lmbd,
    rho,
    kern: Optional[jnp.ndarray] = None,
    iso: bool = False,
    maxit: int = 500,
    *,
    tol: float = 1e-4,
    mesh: Mesh,
    axis: str = "space",
    iso_mode: str = "sample",
    adapt_rho: bool = True,
    rho_mu: float = 10.0,
    rho_scale: float = 2.0,
    fft_impl: str = "auto",
    x_update_mode: str = "pencil",
    halo: int = 32,
) -> AdaptiveResult:
    """Residual-stopped / adaptive-rho spatial solver: residual norms psum
    over the space axis so every shard stops and rescales rho jointly.
    ``x_update_mode``/``halo`` as in :func:`spatial_admm_tv`."""
    n = mesh.shape[axis]
    b, c, h, w = xin.shape
    assert h % n == 0
    kern_arr = None if kern is None or kern.size == 0 else jnp.asarray(kern)
    dtype = xin.dtype
    if x_update_mode == "halo":
        from torch_admm_deconv_tpu.ops.solver import _resolve_fft_impl

        impl = _resolve_fft_impl(fft_impl, kern_arr)
    else:
        impl = _resolve_spatial_fft_impl(fft_impl, kern_arr)

    jitted = _adaptive_sharded_fn(
        mesh, axis, n, h, w, jnp.dtype(dtype).name, impl, x_update_mode, halo,
        kern_arr is not None, iso, iso_mode, maxit, float(tol), adapt_rho,
        float(rho_mu), float(rho_scale),
    )
    args = (xin, jnp.asarray(lmbd, dtype), jnp.asarray(rho, dtype)) + (
        (kern_arr,) if kern_arr is not None else ()
    )
    x, k, r, s_res, rho_f = jitted(*args)
    return AdaptiveResult(x=x, iters=k, r_norm=r, s_norm=s_res, rho=rho_f)


@lru_cache(maxsize=64)
def _adaptive_sharded_fn(mesh, axis, n, h, w, dtype_name, impl, x_update_mode,
                         halo, has_kern, iso, iso_mode, maxit, tol, adapt_rho,
                         rho_mu, rho_scale):
    """Build-and-jit the sharded adaptive solver once per static config (see
    :func:`_fixed_sharded_fn` for why)."""
    dtype = jnp.dtype(dtype_name)

    def local(xin_l, lmbd_s, rho_s, *maybe_kern):
        kern_l = maybe_kern[0] if maybe_kern else None
        h_local = xin_l.shape[-2]
        lmbd_ = jnp.reshape(lmbd_s, ()).astype(dtype)
        rho0 = jnp.reshape(rho_s, ()).astype(dtype)

        if x_update_mode == "halo":
            x_up, h_abs2, d2, hty_fn = _make_halo_ops(
                kern_l, fft_impl=impl, axis_name=axis, n=n,
                h_local=h_local, w=w, halo=halo, dtype=dtype,
            )
            hty = hty_fn(xin_l)
            solve_x = lambda s_rhs, rho_k: x_up(  # noqa: E731
                s_rhs, 1.0 / (h_abs2 + rho_k * d2)
            )
        else:
            fwd, inv, mul_real, mul_conj = _make_sharded_freq_ops(
                impl, axis, n, h, w, h_local
            )
            kx, valid = _my_cols(axis, n, w)
            d2 = grad_abs2_cols(h, w, kx, dtype)
            if kern_l is None:
                h_abs2 = jnp.ones((), dtype)
                hty = xin_l
            else:
                otf_c = psf_otf_centered_cols(kern_l, h, w, kx, dtype)
                h_abs2 = (otf_c.real**2 + otf_c.imag**2).astype(dtype)
                hty = inv(mul_conj(fwd(xin_l), otf_c))
            solve_x = lambda s_rhs, rho_k: inv(  # noqa: E731
                mul_real(
                    fwd(s_rhs),
                    jnp.where(valid[None, :], 1.0 / (h_abs2 + rho_k * d2), 0.0),
                )
            )

        def reduce_all(v):
            return jax.lax.psum(jnp.sum(v), axis_name=axis)

        scale = jnp.sqrt(reduce_all(jnp.ones_like(xin_l)) * 2.0)
        zeros = jnp.zeros_like(xin_l)
        one = jnp.ones((), dtype)

        def cond(carry):
            k, *_rest, r, s_res, _rho = carry
            return jnp.logical_and(k < maxit, jnp.logical_or(r > tol, s_res > tol))

        def bodyf(carry):
            k, x, z_x, z_y, u_x, u_y, _, _, rho_k = carry
            s_rhs = hty + rho_k * (dx_t_local(z_x - u_x) + dy_t_sharded(z_y - u_y, axis, n))
            x = solve_x(s_rhs, rho_k)
            dxk = dx_local(x)
            dyk = dy_sharded(x, axis, n)
            tau = lmbd_ / rho_k
            z_x_new, z_y_new = _shrink(dxk + u_x, dyk + u_y, tau, iso, iso_mode)
            u_x = u_x + dxk - z_x_new
            u_y = u_y + dyk - z_y_new

            rx = dxk - z_x_new
            ry = dyk - z_y_new
            r = jnp.sqrt(reduce_all(rx * rx + ry * ry)) / scale
            sd = rho_k * (
                dx_t_local(z_x_new - z_x) + dy_t_sharded(z_y_new - z_y, axis, n)
            )
            s_res = jnp.sqrt(reduce_all(sd * sd)) / scale

            if adapt_rho:
                grow = r > rho_mu * s_res
                shrink_ = s_res > rho_mu * r
                factor = jnp.where(grow, rho_scale, jnp.where(shrink_, 1.0 / rho_scale, 1.0))
                rho_k = rho_k * factor
                u_x = u_x / factor
                u_y = u_y / factor
            return (k + 1, x, z_x_new, z_y_new, u_x, u_y, r, s_res, rho_k)

        init = (jnp.zeros((), jnp.int32), zeros, zeros, zeros, zeros, zeros, one, one, rho0)
        k, x, *_r, r, s_res, rho_f = jax.lax.while_loop(cond, bodyf, init)
        return x, k, r, s_res, rho_f

    spec_x = P(None, None, axis, None)
    spec_s = P()
    in_specs = (spec_x, spec_s, spec_s) + ((spec_s,) if has_kern else ())
    out_specs = (spec_x, spec_s, spec_s, spec_s, spec_s)
    sharded = jax.shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return jax.jit(sharded)
