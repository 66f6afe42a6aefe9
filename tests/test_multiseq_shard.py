"""Multi-sequence work sharding over 2 processes (slow tier).

Drives tools/multiseq_shard.py — the BASELINE `stereo_euroc` story:
two DIFFERENT stereo sequences through the same hall, one per
jax.distributed rank (real work sharding), maps aligned by cross-map
BoW + fixed-scale Sim3 (parallel/map_merge.py), merged, seam-fused, and
polished by a DISTRIBUTED global BA across the 2-process mesh.

Gates: both ranks >85% tracked, bit-identical merged results, >0
cross-map covisibility edges (the seam really bridges the maps), and a
merged ATE bounded by the per-rank drift it inherits.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.xdist_group("jax_distributed")
@pytest.mark.slow
def test_multiseq_work_sharding_two_processes():
    env = dict(os.environ)
    env.pop("MS_RANK", None)
    env["MS_PORT"] = "12399"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiseq_shard.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3500,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert line, proc.stderr[-3000:]
    out = json.loads(line[-1])
    assert out["ok"] is True, out
    assert out["ranks_agree"] is True, out
    assert out["cross_covis_edges"] > 0, out
    assert out["merged_ate_m"] < 2.0 * max(out["local_ate_m"]), out
    # Work sharding: the ranks really processed different sequences.
    assert out["total_frames"] == 240
