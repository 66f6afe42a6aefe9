"""Distributed-BA scaling curve: LM iterations/s at 1/2/4/8 devices.

Runs the point-block-partitioned global-BA solve (parallel/dist_ba.py,
shard_map) on a KITTI-scale synthetic problem over meshes of increasing
size and reports iterations/s + parallel efficiency. The problem is
partitioned and placed ONCE per mesh (partition time reported
separately); the timed loop is `solve_partitioned`, the resident path
the engine uses. On this machine the devices are virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) sharing physical
cores, so the curve measures the sharding overhead (collectives +
per-device dispatch), not multi-chip speedup — on real multi-chip
hardware the same program's psums ride ICI.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/bench_dist_ba.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# sitecustomize imports jax before env vars apply; force via config.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from orb_slam_cuda_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from orb_slam_cuda_tpu.geometry import se3
from orb_slam_cuda_tpu.geometry.camera import Camera
from orb_slam_cuda_tpu.parallel import (
    make_mesh,
    partition_problem,
    solve_partitioned,
)
from orb_slam_cuda_tpu.solvers import bundle_adjust as ba

# KITTI-00-class problem: ~1.3k keyframes, 100k points, 600k observations.
N_CAMS = int(os.environ.get("DBA_CAMS", 256))
N_PTS = int(os.environ.get("DBA_PTS", 20000))
N_OBS = int(os.environ.get("DBA_OBS", 120000))
LM_ITERS = 10
CG_ITERS = 20
REPS = 3


def build_problem(rng):
    cam = Camera.create(fx=718.0, fy=718.0, cx=600.0, cy=180.0,
                        width=1241, height=376)
    poses = []
    for k in range(N_CAMS):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.3 * k
        xi[4] = 0.01 * np.sin(k * 0.1)
        poses.append(np.asarray(se3.exp(jnp.asarray(xi))))
    poses = np.stack(poses)
    X = np.stack([
        rng.uniform(-50, 50 + 0.3 * N_CAMS, N_PTS),
        rng.uniform(-5, 5, N_PTS),
        rng.uniform(5, 60, N_PTS),
    ], -1).astype(np.float32)
    oc = rng.integers(0, N_CAMS, N_OBS).astype(np.int32)
    op = rng.integers(0, N_PTS, N_OBS).astype(np.int32)
    Xc = np.einsum("eij,ej->ei", poses[oc, :3, :3], X[op]) + poses[oc, :3, 3]
    z = np.maximum(Xc[:, 2], 0.5)
    uv = np.stack([
        718.0 * Xc[:, 0] / z + 600.0, 718.0 * Xc[:, 1] / z + 180.0
    ], -1).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    # Perturb initial estimates.
    noise = np.stack([
        np.asarray(se3.exp(jnp.asarray(rng.normal(0, 0.01, 6).astype(np.float32))))
        for _ in range(N_CAMS)
    ])
    poses0 = np.einsum("kij,kjl->kil", noise, poses)
    problem = ba.BAProblem(
        cam_pose=jnp.asarray(poses0),
        cam_fixed=jnp.asarray(np.arange(N_CAMS) == 0),
        xyz=jnp.asarray(X + rng.normal(0, 0.05, X.shape).astype(np.float32)),
        pt_valid=jnp.ones((N_PTS,), bool),
        obs_cam=jnp.asarray(oc),
        obs_pt=jnp.asarray(op),
        obs_uv=jnp.asarray(uv),
        obs_ur=jnp.full((N_OBS,), -1.0, jnp.float32),
        obs_inv_sigma2=jnp.ones((N_OBS,), jnp.float32),
        obs_valid=jnp.ones((N_OBS,), bool),
    )
    return problem, cam


def main():
    rng = np.random.default_rng(11)
    problem, cam = build_problem(rng)
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}",
          file=sys.stderr)
    print(f"problem: C={N_CAMS} P={N_PTS} E={N_OBS}", file=sys.stderr)
    results = {}
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(jax.devices()):
            break
        mesh = make_mesh(n_dev)
        tp0 = time.perf_counter()
        part = partition_problem(problem, mesh)
        jax.block_until_ready(part.local.obs_uv)
        t_part = time.perf_counter() - tp0
        r = solve_partitioned(
            part, cam, mesh, lm_iters=LM_ITERS, cg_iters=CG_ITERS
        )
        jax.block_until_ready(r.cam_pose)  # compile
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = solve_partitioned(
                part, cam, mesh, lm_iters=LM_ITERS, cg_iters=CG_ITERS
            )
            jax.block_until_ready(r.cam_pose)
        dt = (time.perf_counter() - t0) / REPS
        iters_s = LM_ITERS / dt
        results[n_dev] = iters_s
        eff = iters_s / (results[1] * n_dev) if 1 in results else 1.0
        print(
            f"devices={n_dev}: {dt*1e3:.1f} ms/solve, {iters_s:.2f} LM iters/s,"
            f" efficiency={eff:.2f}, partition={t_part*1e3:.0f} ms,"
            f" final_err={float(r.final_error):.1f}",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "dist_ba_lm_iters_per_second",
        "per_devices": {str(k): round(v, 3) for k, v in results.items()},
        "lm_iters": LM_ITERS, "cg_iters": CG_ITERS,
        "problem": {"cams": N_CAMS, "pts": N_PTS, "obs": N_OBS},
    }))


if __name__ == "__main__":
    main()
