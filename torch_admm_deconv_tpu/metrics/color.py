"""sRGB -> CIELAB conversion in JAX.

Replaces the reference's kornia dependency (``kornia.color.rgb_to_lab``,
used by SSIMLabColorLoss at emetrics/metrics.py:158-215; kornia is not even
declared in its pyproject). Same convention: input RGB in [0, 1], D65 white
point, L in [0, 100], a/b roughly [-100, 100].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# sRGB -> XYZ (D65) matrix
_RGB2XYZ = jnp.asarray(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)
_WHITE = jnp.asarray([0.950456, 1.0, 1.088754])


def _srgb_linearize(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, H, W) RGB in [0, 1] -> (B, 3, H, W) Lab."""
    lin = _srgb_linearize(jnp.clip(rgb, 0.0, 1.0))
    # explicit precision: TPU default (bf16) einsum would add ~1e-2 relative
    # noise to the Lab values feeding the training loss
    xyz = jnp.einsum(
        "ij,bjhw->bihw",
        _RGB2XYZ.astype(rgb.dtype),
        lin,
        precision=jax.lax.Precision.HIGHEST,
    )
    xyz = xyz / _WHITE.astype(rgb.dtype)[None, :, None, None]

    eps = 0.008856
    kappa = 7.787
    # double-where keeps cbrt's gradient finite on the linear branch
    safe = jnp.where(xyz > eps, xyz, 1.0)
    f = jnp.where(xyz > eps, jnp.cbrt(safe), kappa * xyz + 16.0 / 116.0)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    lum = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([lum, a, b], axis=1)


def rgb_to_grayscale(rgb: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma, matching torchvision rgb_to_grayscale."""
    w = jnp.asarray([0.2989, 0.587, 0.114], rgb.dtype)
    return jnp.einsum("c,bchw->bhw", w, rgb)[:, None]
