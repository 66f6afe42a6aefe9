"""Full-System 2-process distributed run (slow tier).

Drives tools/multihost_system.py: the COMPLETE SLAM engine on a
jax.distributed 2-process × 4-virtual-device global mesh — tracking
process-local, the loop-closure global BA (parallel/dist_ba.py) and the
periodic covisibility-cluster block BA (parallel/cluster_ba.py,
SystemConfig.cluster_refine_interval) as cross-process SPMD programs.
Gates: ≥1 loop closed, ≥1 cluster refinement, >90% tracked, and
bit-identical trajectories on both ranks.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.xdist_group("jax_distributed")
@pytest.mark.slow
def test_full_system_two_processes():
    env = dict(os.environ)
    env.pop("MH_RANK", None)
    env["MH_PORT"] = "12397"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_system.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3500,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert line, proc.stderr[-3000:]
    out = json.loads(line[-1])
    assert out["ok"] is True, out
    assert out["ranks_agree"] is True, out
    assert out["loops_closed"] >= 1, out
    assert out["cluster_refines"] >= 1, out
    assert out["tracked_ratio"] > 0.9, out
