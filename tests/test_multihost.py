"""Single-process checks of the multi-host glue (mesh ordering, local shard
ranges, batch assembly fallback)."""

import numpy as np

from besskge_tpu.parallel.multihost import (
    local_shard_range,
    make_global_mesh,
    shard_batch_multihost,
)


def test_global_mesh_and_ranges():
    mesh = make_global_mesh(4)
    assert mesh.devices.size == 4
    lo, hi = local_shard_range(mesh)
    assert (lo, hi) == (0, 4)  # single process owns everything


def test_shard_batch_multihost_single_process():
    mesh = make_global_mesh(4)
    batch = {"head": np.zeros((2, 4, 8), np.int32)}
    out = shard_batch_multihost(batch, mesh)
    assert out["head"].shape == (2, 4, 8)
    assert len(out["head"].sharding.device_set) == 4


def test_two_process_train_step(tmp_path):
    """REAL multihost: 2 jax.distributed processes x 4 CPU devices run the
    same 8-shard train step; their (psum-global) losses must agree with each
    other and with a single-process 8-device run of the same step."""
    import json
    import socket
    import subprocess
    import sys
    import os

    # Single-process reference loss: reuse the worker's model setup by
    # running it as a 1-process "cluster".
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    def free_port():
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    def launch(pid, nproc, port):
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")
        }
        return subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )

    def run_cluster(nproc):
        port = free_port()
        procs = [launch(i, nproc, port) for i in range(nproc)]
        outs = []
        for p in procs:
            stdout, stderr = p.communicate(timeout=420)
            assert p.returncode == 0, stderr[-3000:]
            outs.append(json.loads(stdout.strip().splitlines()[-1]))
        return outs

    two = run_cluster(2)
    one = run_cluster(1)
    losses = [o["loss"] for o in two]
    assert losses[0] == losses[1], losses  # identical global psum
    np.testing.assert_allclose(losses[0], one[0]["loss"], rtol=1e-5)
