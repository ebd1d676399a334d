"""Real multi-process (multi-host simulation) validation: 2 OS processes x 4
virtual CPU devices, jax.distributed + Gloo collectives, the library's own
initialize_distributed/mesh/sharding layout, sharded TGN steps bit-matching a
single-device replay (tools/multihost_sim.py; artifact MULTIHOST_r02.json)."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_two_process_sharded_tgn_matches_single_device(tmp_path):
    out = tmp_path / "multihost.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # strip the axon sitecustomize (forces TPU)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_sim.py"),
         "--num-processes", "2", "--port", "12981", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(out.read_text())
    assert rec["ok"], rec
    assert rec["global_devices"] == 8
    assert rec["max_abs_diff"] < 5e-4
