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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> Tuple[int, int]:
    """Multi-host bootstrap (SURVEY.md §2.5 communication-backend row).

    Initializes the JAX process group so ``jax.devices()`` spans every
    host's chips and jit-compiled collectives ride ICI across the slice
    (DCN across slices). On TPU pods all arguments auto-populate from the
    environment (``jax.distributed.initialize()`` with no args); pass them
    explicitly for multi-process CPU testing (tests/test_multihost.py).

    Returns ``(process_index, process_count)``. Safe to call once per
    process, before any other JAX API touches the backend.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def process_batch_bounds(global_batch: int) -> slice:
    """This process's slice of the global batch (per-host data loading).

    Each host loads only its own images; ``shard_host_batch`` assembles the
    global array without any cross-host copy of pixel data.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} must divide over {n} processes")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_host_batch(local_batch, mesh: Mesh, spec: P = P("data")):
    """Assemble a globally-sharded array from this process's local shard.

    ``local_batch`` is the host-local slice (see ``process_batch_bounds``);
    the result is a global jax.Array laid out per ``spec`` over ``mesh``
    with each piece already resident on its owner's devices.
    """
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_batch)
    )


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NCHW batch sharded over the batch dimension."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    """NCHW batch sharded over image rows (H)."""
    return NamedSharding(mesh, P(None, None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
