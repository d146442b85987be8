"""One JAX process of a 2-process CPU 'pod' (driven by test_multihost.py).

Exercises the multi-host bootstrap end to end: ``jax.distributed``
coordination service, a global mesh spanning both processes' devices,
per-host batch loading (``process_batch_bounds`` + ``shard_host_batch``),
and a batch-sharded solve whose reference-compat batch-coupled iso norm
reduces across the process boundary (an XLA psum over DCN in production,
gRPC here).
"""

import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    port, pid = sys.argv[1], int(sys.argv[2])

    from torch_admm_deconv_tpu.ops.solver import admm_tv
    from torch_admm_deconv_tpu.parallel.mesh import (
        init_distributed,
        make_mesh,
        process_batch_bounds,
        shard_host_batch,
    )

    idx, n = init_distributed(
        f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert (idx, n) == (pid, 2), (idx, n)
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = make_mesh((8,), ("data",))
    rng = np.random.default_rng(0)  # same stream on both hosts
    full = (rng.normal(size=(8, 1, 16, 16)) * 0.1 + 0.5).astype(np.float32)
    sl = process_batch_bounds(8)
    x = shard_host_batch(full[sl], mesh)

    out = jax.jit(lambda v: admm_tv(v, 0.05, 0.8, None, iso=True, maxit=10))(x)
    gathered = jax.jit(lambda v: v, out_shardings=NamedSharding(mesh, P()))(out)
    got = np.asarray(jax.device_get(gathered))
    print(f"CHECKSUM {float(np.sum(got)):.5f}", flush=True)
    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
