"""Two-PROCESS multi-host test: the map shards across processes and the
step runs over a ("hosts", "devices") mesh (SURVEY §7 phase 6;
BASELINE.md north star N>=2 hosts).

Spawns a coordinator + two worker processes over localhost CPU (4 virtual
devices each -> 8 global), each of which asserts physical partitioning of
the map across the host axis and numerical agreement with a
single-process reference run (tests/multihost_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_host_mesh():
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {i} rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
        assert f"MULTIHOST_OK pid={i}" in out, (out, err)
