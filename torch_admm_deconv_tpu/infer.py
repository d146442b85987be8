"""Production inference: restore arbitrary-size images with a fixed-shape
compiled step via overlap-discard tiling.

The reference has no inference path beyond notebooks running 256x256 crops
through the model one at a time (/root/reference/notebooks/eval_algs.ipynb,
test_train.ipynb cell 26 — which also hand-fixes the border artifacts this
module avoids by construction). TPU-native constraints make tiling the right
design, not just a convenience: XLA compiles one executable per shape, so
serving arbitrary H x W images by whole-image jit would recompile per size
(10 s-3 min on this toolchain). Instead:

* the image is reflect-padded and cut into fixed ``tile x tile`` windows
  that overlap by ``margin`` pixels on every side;
* tiles are batched through the compiled apply function (ONE compiled
  shape, MXU-friendly batching);
* only the centre ``tile - 2*margin`` core of each output tile is kept
  (overlap-discard), so the periodic/reflect boundary handling of the
  solver or the receptive field of the CNN never touches visible pixels as
  long as ``margin`` exceeds the effective receptive field.

This is the single-device sibling of the sharded spatial path
(parallel/spatial.py): that one cuts an image across chips with halo
exchange; this one cuts it across time on one chip with halo discard.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import numpy as np

Array = np.ndarray


def _pad_reflect(img: Array, top: int, bottom: int, left: int, right: int) -> Array:
    return np.pad(img, ((0, 0), (top, bottom), (left, right)), mode="reflect")


def tiled_apply(
    apply_fn: Callable,
    img_chw: Array,
    *,
    tile: int = 256,
    margin: int = 32,
    max_batch: int = 8,
) -> Array:
    """Apply a (B, C, tile, tile) -> (B, C, tile, tile) function to an
    arbitrary-size (C, H, W) image by overlap-discard tiling.

    ``margin`` must exceed the effective receptive field of ``apply_fn``
    (for TV-ADMM denoising, a few times the diffusion length — 16-32 px is
    ample; for CNNs, half the receptive field). Tiles are batched up to
    ``max_batch`` per device call; every call has the same shape, so the
    function compiles exactly once.
    """
    if img_chw.ndim != 3:
        raise ValueError(f"expected (C, H, W), got {img_chw.shape}")
    if not 0 <= 2 * margin < tile:
        raise ValueError(f"need 0 <= 2*margin < tile, got tile={tile} margin={margin}")
    c, h, w = img_chw.shape
    core = tile - 2 * margin

    ny = max(1, math.ceil(h / core))
    nx = max(1, math.ceil(w / core))
    # reflect-pad so the padded image is exactly margin + ny*core + margin;
    # np.pad(reflect) caps each pad at dim-1, so grow in rounds for tiny images
    need_b = ny * core - h + margin
    need_r = nx * core - w + margin
    padded = img_chw
    top, left = margin, margin
    while top > 0 or need_b > 0 or left > 0 or need_r > 0:
        t = min(top, padded.shape[1] - 1)
        b = min(max(need_b, 0), padded.shape[1] - 1)
        le = min(left, padded.shape[2] - 1)
        r = min(max(need_r, 0), padded.shape[2] - 1)
        if t == b == le == r == 0:  # 1-pixel dims: reflect can't grow — edge pad
            padded = np.pad(
                padded,
                ((0, 0), (top, max(need_b, 0)), (left, max(need_r, 0))),
                mode="edge",
            )
            break
        padded = _pad_reflect(padded, t, b, le, r)
        top -= t
        need_b -= b
        left -= le
        need_r -= r

    tiles = np.empty((ny * nx, c, tile, tile), img_chw.dtype)
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * core, ix * core
            tiles[iy * nx + ix] = padded[:, y0 : y0 + tile, x0 : x0 + tile]

    outs = np.empty_like(tiles)
    n = tiles.shape[0]
    for s in range(0, n, max_batch):
        batch = tiles[s : s + max_batch]
        if batch.shape[0] < max_batch:  # keep the compiled shape unique
            batch = np.concatenate(
                [batch, np.zeros((max_batch - batch.shape[0],) + batch.shape[1:], batch.dtype)]
            )
        outs[s : s + max_batch] = np.asarray(apply_fn(batch))[: min(max_batch, n - s)]

    result = np.empty((c, ny * core, nx * core), img_chw.dtype)
    for iy in range(ny):
        for ix in range(nx):
            t = outs[iy * nx + ix]
            result[:, iy * core : (iy + 1) * core, ix * core : (ix + 1) * core] = t[
                :, margin : margin + core, margin : margin + core
            ]
    return result[:, :h, :w]


def classical_restorer(
    lmbd: float = 0.05,
    rho: float = 1.0,
    maxit: int = 100,
    iso: bool = True,
    kern: Optional[np.ndarray] = None,
    use_pallas: bool = True,
) -> Callable:
    """Compiled batch apply_fn for the classical TV-ADMM solver (for
    :func:`tiled_apply` / :func:`restore_image`)."""
    import jax
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.ops.solver import admm_tv

    k = None if kern is None else jnp.asarray(kern)

    def apply_fn(batch):
        return admm_tv(
            jnp.asarray(batch), lmbd, rho, k, iso=iso, maxit=maxit, use_pallas=use_pallas
        )

    return jax.jit(apply_fn) if not use_pallas else apply_fn  # pallas path jits inside


def model_restorer(ckpt_path: str, model=None) -> Callable:
    """Compiled batch apply_fn from a trained checkpoint. ``model`` defaults
    to the flagship DivergentRestorer config (scripts/train.py:70-73 in the
    reference)."""
    import jax
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.train.saver import load_checkpoint

    if model is None:
        from torch_admm_deconv_tpu.models.denoiser import flagship_divergent_restorer

        model = flagship_divergent_restorer(remat=False, use_pallas=True)
    params = jax.tree_util.tree_map(
        jnp.asarray, load_checkpoint(ckpt_path)["model_state_dict"]
    )
    return jax.jit(lambda x: model.apply(params, jnp.asarray(x)))


def restore_image(
    apply_fn: Callable,
    img_chw: Array,
    *,
    tile: int = 256,
    margin: int = 32,
    max_batch: int = 8,
) -> Array:
    """Restore one (C, H, W) float image in [0, 1]; output clipped to [0, 1]."""
    out = tiled_apply(
        apply_fn, np.asarray(img_chw, np.float32), tile=tile, margin=margin, max_batch=max_batch
    )
    return np.clip(out, 0.0, 1.0)
