"""Multi-process (DCN-style) rehearsal: the 2-process jax.distributed path.

Runs tools/multihost_rehearsal.py's launcher — 2 CPU processes x 4 virtual
devices, process-spanning 8-device mesh, the limb-sharded flagship step
with cross-process collectives, bit-identical to the unsharded step, plus
a multiparty share psum across the process boundary (SURVEY §2.8/§5.8,
BASELINE north star #2 code path).
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_sharded_step():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the launcher sets per-worker device counts itself
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "multihost_rehearsal.py"),
         "--no-report", "--no-baseline"],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=800)
    assert out.returncode == 0, out.stderr[-3000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["procs"] == 2
    assert stats["sharded_bit_identical"] is True
    assert stats["party_psum_cross_process"] is True
