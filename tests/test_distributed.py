"""True multi-process mesh test: 2 x 4-device CPU processes over
``jax.distributed`` (SURVEY.md §4 item 4 — multi-host tests without TPUs).

Every other parallel test runs single-process with 8 virtual devices; this
one actually spans ``make_two_level_mesh``'s host boundary: process 0 and
process 1 each own 4 devices, the data axis crosses the process (DCN analog)
boundary, and the sharded train step + sampler must produce identical
replicated results on both ranks.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_train_and_sample():
    # Hang protection comes from communicate(timeout=240) below
    # (pytest-timeout is not installed in this environment).
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # never touch the TPU tunnel
    env.pop("XLA_FLAGS", None)        # workers set their own device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    results = [[ln for ln in o.splitlines() if ln.startswith("RESULT")]
               for o in outs]
    assert results[0] and results[1], outs
    # replicated outputs must agree bit-for-bit across ranks
    assert results[0][-1] == results[1][-1], results
