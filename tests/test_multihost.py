"""Multi-host (multi-process) mesh tests: two REAL jax processes on localhost
(SURVEY.md §5.8 — jax.distributed.initialize + DCN x ICI mesh), each with 4
fake CPU devices, running the full sharded ASR batch from host-local inputs.
"""

import os
import socket
import subprocess
import sys

from deeplabv3plus_augmented_superresolution_tpu.parallel import (
    initialize_distributed,
    multihost_mesh_shape,
)

HERE = os.path.dirname(os.path.abspath(__file__))


def test_multihost_mesh_shape_factorization():
    assert multihost_mesh_shape(2, 4) == ((2, 1), (1, 4))
    assert multihost_mesh_shape(16, 8) == ((16, 1), (1, 8))


def test_initialize_distributed_noop_without_config(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_two_process_asr_batch():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outputs.append((p.returncode, out))
    for pid, (rc, out) in enumerate(outputs):
        assert rc == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "multihost ASR batch OK over mesh {'data': 2, 'aug': 4}" in out
        assert "multihost train step OK" in out
    # Replicated outputs: both processes computed the same global loss.
    losses = [out.split("train step OK, loss ")[1].split()[0]
              for _, out in outputs]
    assert losses[0] == losses[1], losses
