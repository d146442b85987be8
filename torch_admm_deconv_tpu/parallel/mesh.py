"""Device mesh construction for data / spatial parallelism.

The reference is strictly single-device (SURVEY.md §2.5 — no
torch.distributed anywhere); everything in parallel/ is beyond-reference
capability per the north star (BASELINE.json): batch-parallel independent
ADMM instances over a ``data`` axis and spatial tiling of megapixel images
over a ``space`` axis, with XLA collectives riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``make_mesh()`` -> 1D 'data' mesh over all devices;
    ``make_mesh((2, 4), ("data", "space"))`` -> 2D mesh.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NCHW batch sharded over the batch dimension."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    """NCHW batch sharded over image rows (H)."""
    return NamedSharding(mesh, P(None, None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
