"""Post-step parameter clamping for ADMM layers.

Capability parity with /root/reference/src/admmtor/modelbuild/
eregularizers.py and the inline ``WeightClipper`` of scripts/train.py:27-38.
In a functional framework clippers are pytree transforms applied to the
params tree after ``optimizer.step`` (the torch versions are
``model.apply`` hooks). The reference's ``ADMMClipper`` bug that writes
rho's values into ``bias`` (eregularizers.py:29) is NOT reproduced.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _clamp_named(params, names: Tuple[str, ...], lo: float, hi: float):
    def walk(tree):
        if isinstance(tree, dict):
            return {
                k: (jnp.clip(v, lo, hi) if k in names and not isinstance(v, dict) else walk(v))
                for k, v in tree.items()
            }
        return tree

    return walk(params)


def admm_weight_clipper(params, keep_range: Tuple[float, float]):
    """Clamp every ADMM PSF kernel ``w`` (eregularizers.py:5-17)."""
    return _clamp_named(params, ("w",), *keep_range)


def admm_clipper(params, max_val: float):
    """Clamp every ``lmbda``/``rho``/``b`` to [1e-9, max_val]
    (eregularizers.py:20-33, with the bias bug fixed)."""
    return _clamp_named(params, ("lmbda", "rho", "b"), 1e-9, max_val)


def train_weight_clipper(params):
    """The inline training clipper: lmbda/rho to [1e-12, 5]
    (scripts/train.py:27-38)."""
    return _clamp_named(params, ("lmbda", "rho"), 1e-12, 5.0)


def clip_grads_by_value(grads, clip_value: float = 1.0):
    """torch.nn.utils.clip_grad_value_ equivalent (trainer.py:63)."""
    return jax.tree_util.tree_map(lambda g: jnp.clip(g, -clip_value, clip_value), grads)
