"""Proximal / shrinkage operators for the TV-ADMM z-update.

Capability parity with the reference's threshold ops
(``/root/reference/src/admmtor/eops/deconv.py:7-28``), re-expressed as pure
jnp functions. All operators are elementwise or small-reduction VPU work and
fuse freely under jit; the solver optionally routes them through the fused
Pallas iteration kernel (``kernels/fused_admm.py``) instead.

The reference's "isotropic" ``block_thresh`` normalizes by a pixel norm
reduced over dims (0, 1) = batch AND channel (deconv.py:23-24), so results
couple across images in a batch. That exact behaviour is kept under
``iso_mode='compat'`` for parity; ``'sample'`` decouples the batch (reduce
over channel only) and ``'joint'`` is textbook isotropic TV on the joint
(z_x, z_y) gradient magnitude — better defaults the reference lacks.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-15


def identity(x: jnp.ndarray) -> jnp.ndarray:
    return x


def abs2(x: jnp.ndarray) -> jnp.ndarray:
    """|x|^2 for real or complex x (reference torch_abs2, deconv.py:7-8)."""
    if jnp.iscomplexobj(x):
        return x.real * x.real + x.imag * x.imag
    return x * x


def hard_thresh(x: jnp.ndarray, tau) -> jnp.ndarray:
    """x * 1[|x| > tau] (deconv.py:11-12)."""
    return x * (jnp.abs(x) > tau).astype(x.dtype)


def soft_thresh(x: jnp.ndarray, tau) -> jnp.ndarray:
    """sign(x) * max(|x| - tau, 0) (deconv.py:15-16)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - tau, 0.0)


def pixelnorm(x: jnp.ndarray, axis=(0, 1), keepdims: bool = False) -> jnp.ndarray:
    """sqrt(sum(x^2, axis) + eps), reference reduces batch+channel
    (deconv.py:23-24)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + _EPS)


def block_thresh(x: jnp.ndarray, tau, axis=(0, 1)) -> jnp.ndarray:
    """max(1 - tau / pixelnorm(x), 0) * x (deconv.py:19-20).

    ``axis`` controls the norm reduction: (0, 1) reproduces the reference's
    batch-coupled behaviour; (1,) gives per-sample channel-coupled shrinkage.
    The norm is broadcast back over the reduced axes.
    """
    norm = pixelnorm(x, axis=axis, keepdims=True)
    scale = jnp.maximum(1.0 - tau / (norm + _EPS), 0.0)
    return scale * x


def block_thresh_joint(zx: jnp.ndarray, zy: jnp.ndarray, tau):
    """Textbook isotropic TV shrinkage on the joint gradient magnitude.

    Per-pixel, per-sample, per-channel: shrink the vector (zx, zy) by tau in
    euclidean norm. Not present in the reference (which thresholds z_x and
    z_y independently, deconv.py:111-112); provided as the corrected option.
    """
    mag = jnp.sqrt(zx * zx + zy * zy + _EPS)
    scale = jnp.maximum(1.0 - tau / mag, 0.0)
    return scale * zx, scale * zy
