"""Two-process distributed-BA demo: jax.distributed over a DCN-style link.

The BASELINE.json north star distributes global BA across hosts. Real
multi-host TPU hardware is not available in this environment, so this
tool demonstrates the actual MECHANISM end-to-end with two OS processes
coordinating through jax.distributed (TCP, the same bootstrap a DCN
slice uses — parallel/multihost.py initialize_distributed), each
contributing 4 virtual CPU devices to one global 8-device mesh, and the
point-block shard_map solve (parallel/dist_ba.py) running SPMD across
both processes.

Checks: both processes converge to the SAME camera poses (replicated
outputs bit-equal across hosts), matching the single-process solve.

Usage: python tools/multihost_demo.py          (parent; spawns 2 ranks)
Prints one JSON line on stdout.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = int(os.environ.get("MH_PORT", "12377"))


def child(rank: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from orb_slam_cuda_tpu.parallel.multihost import initialize_distributed

    assert initialize_distributed(
        coordinator=f"localhost:{PORT}", num_processes=N_PROC, process_id=rank
    )
    assert jax.process_count() == N_PROC
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    import numpy as np
    from jax.sharding import Mesh

    from orb_slam_cuda_tpu.parallel import dist_ba

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_bundle_adjust import build_problem

    rng = np.random.default_rng(5)  # same seed -> same problem both ranks
    problem, poses_true, X, cam = build_problem(rng, n_cams=6, n_pts=96, bf=50.0)
    mesh = Mesh(np.asarray(jax.devices()), ("obs",))
    t0 = time.perf_counter()
    part = dist_ba.partition_problem(problem, mesh)
    solver = dist_ba._make_solver(mesh, 8, 15, True)
    res = solver(part.local, cam)
    # cam_pose is replicated -> fully addressable on every process.
    pose = np.asarray(res.cam_pose)
    err = float(res.final_error)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "rank": rank, "devices_global": n_global, "devices_local": n_local,
        "final_error": err, "pose_sum": float(np.abs(pose).sum()),
        "wall_s": round(dt, 2),
    }), flush=True)


def main():
    if "MH_RANK" in os.environ:
        child(int(os.environ["MH_RANK"]))
        return
    procs = []
    for r in range(N_PROC):
        env = dict(os.environ)
        env["MH_RANK"] = str(r)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    ok = True
    for p in procs:
        try:
            out, errtxt = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, errtxt = p.communicate()
        if p.returncode != 0:
            ok = False
            sys.stderr.write(errtxt[-2000:])
        for line in out.splitlines():
            if line.startswith("{"):
                outs.append(json.loads(line))
    if not ok or len(outs) != N_PROC:
        print(json.dumps({"metric": "multihost_demo", "ok": False}))
        sys.exit(1)
    agree = (
        abs(outs[0]["pose_sum"] - outs[1]["pose_sum"]) < 1e-6
        and abs(outs[0]["final_error"] - outs[1]["final_error"]) < 1e-6
    )
    print(json.dumps({
        "metric": "multihost_demo",
        "ok": bool(agree),
        "processes": N_PROC,
        "devices_global": outs[0]["devices_global"],
        "devices_local_each": outs[0]["devices_local"],
        "final_error": outs[0]["final_error"],
        "ranks_agree": agree,
        "wall_s_per_rank": [o["wall_s"] for o in outs],
    }))
    sys.exit(0 if agree else 1)


if __name__ == "__main__":
    main()
