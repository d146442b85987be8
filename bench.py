"""Headline benchmark: batched TV-ADMM deconvolution iterations/s/chip.

Config (BASELINE.json configs 1-2 scaled to the single available chip):
batch 8 RGB 512x512, 9x9 gaussian PSF, anisotropic TV, fixed rho, 200
iterations, whole-solve-in-VMEM Pallas path with the mixed-precision
(inexact-ADMM) schedule — first 3/4 of the iterations use single-pass bf16
x-update matmuls, the bf16x3 tail contracts the roundoff (measured max
deviation vs the all-bf16x3 solve: 3e-4 at this exact config; see
scripts/bench_mixed_precision.py).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is the speedup over the reference implementation's update
equations executed by torch on this host (CPU — the reference's CUDA path
has no GPU here; the reference repo publishes no throughput numbers at all,
BASELINE.md). The torch baseline runs the same batch/shape/iteration math.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_tpu(batch=8, size=512, maxit=200, psf_size=9):
    """Iteration-scaling timing: time the same solver at two iteration
    counts and difference them — fetch/dispatch overhead (large over the
    device tunnel, whose block_until_ready does not await completion)
    cancels, and the compiled graph stays small."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.ops.solver import admm_tv
    from torch_admm_deconv_tpu.utils.profiling import iter_scaling_throughput

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 3, size, size), dtype=np.float32))
    kern = jnp.asarray(_gaussian_psf(psf_size, 1.5))

    def solver_of_maxit(m):
        return lambda v: admm_tv(
            v, 0.002, 0.5, kern, iso=False, maxit=m, use_pallas=True, precision="mixed"
        )

    per_iter = iter_scaling_throughput(solver_of_maxit, x, m_small=maxit, m_big=5 * maxit)
    return 1.0 / per_iter, per_iter * maxit


def _gaussian_psf(size, sigma):
    ax = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2.0 * sigma**2))
    k = np.outer(g, g)
    return (k / k.sum()).reshape(1, 1, size, size).astype(np.float32)


def bench_torch_reference(batch=8, size=512, iters=3, psf_size=9):
    """The reference's update equations (deconv.py:35-117 math) in torch on
    this host, timed per iteration."""
    try:
        import torch
        import torch.nn.functional as F
    except ImportError:
        return None

    torch.set_num_threads(torch.get_num_threads())
    x = torch.rand(batch, 3, size, size)
    psf = torch.from_numpy(_gaussian_psf(psf_size, 1.5))
    lmbd, rho = 0.002, 0.5
    tau = lmbd / rho
    h, w = size, size

    sigma = torch.fft.rfftn(psf, s=(h, w), dim=(2, 3))
    dxk = torch.zeros(h, w)
    dxk[1, 0], dxk[1, 1] = -1.0, 1.0
    dyk = torch.zeros(h, w)
    dyk[0, 1], dyk[1, 1] = -1.0, 1.0
    d2 = torch.fft.rfft2(dxk).abs() ** 2 + torch.fft.rfft2(dyk).abs() ** 2
    freq_c = 1.0 / (sigma.abs() ** 2 + rho * d2)

    c = x.shape[1]
    kflip = psf.flip(2, 3).repeat(c, 1, 1, 1)
    p = (psf_size - 1) // 2
    q = psf_size - 1 - p

    def htran(v):
        return F.conv2d(F.pad(v, (p, q, p, q), mode="circular"), kflip, groups=c)

    def dx(v):
        return v - torch.roll(v, 1, -1)

    def dy(v):
        return v - torch.roll(v, 1, -2)

    def dx_t(v):
        return v - torch.roll(v, -1, -1)

    def dy_t(v):
        return v - torch.roll(v, -1, -2)

    z_x = torch.zeros_like(x)
    z_y = torch.zeros_like(x)
    u_x = torch.zeros_like(x)
    u_y = torch.zeros_like(x)
    hty = htran(x)

    t0 = time.perf_counter()
    for _ in range(iters):
        rhs = hty + rho * (dx_t(z_x - u_x) + dy_t(z_y - u_y))
        xk = torch.fft.irfftn(freq_c * torch.fft.rfftn(rhs, dim=(2, 3)), (h, w), dim=(2, 3))
        dxv, dyv = dx(xk), dy(xk)
        z_x = torch.sign(dxv + u_x) * torch.clamp((dxv + u_x).abs() - tau, min=0)
        z_y = torch.sign(dyv + u_y) * torch.clamp((dyv + u_y).abs() - tau, min=0)
        u_x = u_x + dxv - z_x
        u_y = u_y + dyv - z_y
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt  # iterations/s


def main():
    iters_per_s, dt = bench_tpu()
    print(
        f"[bench] 200-iter batch-8 RGB 512x512 deblur: {dt:.4f}s/solve "
        f"({iters_per_s:.1f} ADMM iters/s/chip)",
        file=sys.stderr,
    )
    ref = bench_torch_reference()
    vs = iters_per_s / ref if ref else None
    if ref:
        print(
            f"[bench] torch reference equations on host CPU: {ref:.2f} iters/s "
            f"(no reference GPU available; reference publishes no throughput numbers)",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "admm_iterations_per_s_per_chip_512x512_batch8_rgb",
                "value": round(iters_per_s, 2),
                "unit": "iterations/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
