"""Two-process distributed smoke test (the JAX way to test multi-host
without a cluster): two subprocesses jax.distributed.initialize over
localhost with 4 virtual CPU devices each (8 global), drive the REAL
multi-host input path (parallel.shard_sequence_folders +
make_global_batch via jax.make_array_from_process_local_data) and one
data-parallel train step — loss must equal the single-process run of the
same global batch.  Makes the process_count>1 branches of
parallel/input_pipeline.py exercised code, not paper."""
import json
import os
import socket
import subprocess
import sys
from os.path import join

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(coordinator, num_procs, pid, data_root, out_json):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    return subprocess.Popen(
        [sys.executable, "tests/dist_worker.py", coordinator,
         str(num_procs), str(pid), data_root, out_json],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


@pytest.fixture
def dist_lock():
    """Serialize distributed runs machine-wide: the two subprocess workers
    starve on this 1-core rig when anything heavy (another suite, a bench)
    runs concurrently — an flock on a well-known path makes concurrent
    sessions queue instead of timing out each other's coordination
    handshake."""
    import fcntl
    f = open("/tmp/rpg_ramnet_tpu_dist_test.lock", "w")
    fcntl.flock(f, fcntl.LOCK_EX)
    try:
        yield
    finally:
        fcntl.flock(f, fcntl.LOCK_UN)
        f.close()


@pytest.mark.slow
def test_two_process_dp_equals_single_process(tmp_path, dist_lock):
    from rpg_ramnet_tpu.data.synthetic import generate_split
    data_root = str(tmp_path / "split")
    generate_split(data_root, n_sequences=8, n_frames=10, height=32, width=48,
                   events_per_frame=200)

    # two processes, 8 global devices
    port = free_port()
    coord = f"localhost:{port}"
    out2 = str(tmp_path / "two_proc.json")
    procs = [launch(coord, 2, pid, data_root, out2) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    r2 = json.load(open(out2))
    assert r2["process_count"] == 2 and r2["devices"] == 8

    # single process, same global data (both folder shards), 4 devices
    out1 = str(tmp_path / "one_proc.json")
    p = launch("unused", 1, 0, data_root, out1)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out[-3000:]
    r1 = json.load(open(out1))
    assert r1["process_count"] == 1

    assert np.isfinite(r2["loss"])
    np.testing.assert_allclose(r2["loss"], r1["loss"], rtol=1e-5)
    np.testing.assert_allclose(r2["grad_norm"], r1["grad_norm"], rtol=1e-4)
