"""Multi-process bootstrap smoke test (SURVEY.md §2.5 comm-backend row).

Spawns two separate Python processes, each owning 4 virtual CPU devices,
joined through ``jax.distributed`` into one 8-device 'pod'; both run the
batch-coupled iso solve over a globally-sharded batch and must agree with
the single-process result.
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WORKER = Path(__file__).parent / "_multihost_worker.py"


def test_two_process_pod_matches_single_process(tmp_path):
    import socket

    with socket.socket() as s:  # grab a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out

    sums = [
        float(line.split()[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("CHECKSUM")
    ]
    assert len(sums) == 2 and abs(sums[0] - sums[1]) < 1e-3, sums

    # single-process oracle on this process's own 8 virtual devices
    from torch_admm_deconv_tpu.ops.solver import admm_tv

    rng = np.random.default_rng(0)
    full = (rng.normal(size=(8, 1, 16, 16)) * 0.1 + 0.5).astype(np.float32)
    want = float(np.sum(np.asarray(admm_tv(jnp.asarray(full), 0.05, 0.8, None, iso=True, maxit=10))))
    assert abs(sums[0] - want) < 5e-2, (sums[0], want)
