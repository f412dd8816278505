"""bench.py backend-acquisition regression tests (r4 verdict item 1).

The judged artifact must be ONE parseable JSON line even when the TPU
backend is unavailable (BENCH_r04.json was a bare stack trace). Run the real
entry point in a subprocess with an impossible platform and assert the
failure contract.
"""

import json
import os
import subprocess
import sys


def test_backend_unavailable_emits_single_json_line():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "bogus"          # backend init raises immediately
    res = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--time-budget", "15"],
        capture_output=True, text=True, timeout=120, env=env)
    assert res.returncode == 0, res.stderr[-500:]
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, res.stdout
    out = json.loads(lines[0])
    assert out["error"] == "backend_unavailable"
    assert out["value"] is None
    # the probe log makes the failure diagnosable — never empty, never ok
    # (the first entry is the real init failure when the probe completed in
    # time, or the synthetic "no probe completed" record when it did not)
    assert out["probe_log"]
    assert all(not a["ok"] for a in out["probe_log"])
    assert out["probe_log"][0]["error"]
