"""Multi-process launch entry point (jax.distributed.initialize mechanics).

Spawns REAL separate processes (subprocess, not the in-process virtual
mesh) and verifies the Gloo-backed global mesh: 2 processes x 2 local
devices -> 4 global devices, cross-process psum correct.
"""

import json
import subprocess
import sys

import pytest


@pytest.mark.timeout(180)
def test_two_process_smoke(tmp_path):
    out = str(tmp_path / "mp.json")
    rc = subprocess.run(
        [sys.executable, "-m", "radarslampy_tpu.parallel.launch",
         "--spawn", "2", "--local-devices", "2", "--smoke",
         "--coordinator", "localhost:12489", "--out", out],
        capture_output=True, timeout=170,
    )
    assert rc.returncode == 0, rc.stderr.decode()[-500:]
    res = json.load(open(out))
    assert res["num_processes"] == 2
    assert res["global_devices"] == 4
    assert res["psum"] == 4.0
