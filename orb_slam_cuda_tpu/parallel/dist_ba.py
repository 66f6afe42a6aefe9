"""Distributed bundle adjustment over a device mesh.

The new distributed capability (BASELINE.json north star; absent from the
single-GPU reference): global BA's observation set is sharded across
devices while camera/point parameters stay replicated. The solver itself
is `solvers.bundle_adjust` unchanged — its per-edge einsums partition
cleanly along the E axis and its segment-sums/dots become cross-device
reductions, which XLA's SPMD partitioner lowers to `psum` over ICI once
the inputs carry shardings (the scaling-book recipe: pick a mesh,
annotate, let the compiler place collectives).

Sharding layout:
  * obs_* arrays: PartitionSpec('obs')  — data-parallel edges;
  * cam/point state: replicated (they are small relative to E and the
    LM update needs them everywhere);
The per-iteration communication is one (C,6)+(P,3) gradient psum plus the
preconditioner blocks — the same quantities PBA reduces on one GPU
(ComputeJtE, reference SparseBundleCU.cpp:1176-1215), reduced across
chips instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import Camera
from ..solvers import bundle_adjust as ba


def _pad_to_multiple(problem: ba.BAProblem, m: int) -> ba.BAProblem:
    """Pad the observation axis so it divides the mesh size (padded rows
    are obs_valid=False and inert — verified by
    test_bundle_adjust.test_padded_rows_inert)."""
    E = problem.obs_cam.shape[0]
    pad = (-E) % m
    if pad == 0:
        return problem
    return problem._replace(
        obs_cam=jnp.concatenate([problem.obs_cam, jnp.full((pad,), -1, jnp.int32)]),
        obs_pt=jnp.concatenate([problem.obs_pt, jnp.full((pad,), -1, jnp.int32)]),
        obs_uv=jnp.concatenate([problem.obs_uv, jnp.zeros((pad, 2), jnp.float32)]),
        obs_ur=jnp.concatenate([problem.obs_ur, jnp.full((pad,), -1.0, jnp.float32)]),
        obs_inv_sigma2=jnp.concatenate([problem.obs_inv_sigma2, jnp.ones((pad,), jnp.float32)]),
        obs_valid=jnp.concatenate([problem.obs_valid, jnp.zeros((pad,), bool)]),
    )


def shard_problem(problem: ba.BAProblem, mesh: Mesh, axis: str = "obs") -> ba.BAProblem:
    """Place the problem on the mesh: observations sharded, state replicated."""
    n = mesh.devices.size
    problem = _pad_to_multiple(problem, n)
    obs_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    return ba.BAProblem(
        cam_pose=put(problem.cam_pose, rep),
        cam_fixed=put(problem.cam_fixed, rep),
        xyz=put(problem.xyz, rep),
        pt_valid=put(problem.pt_valid, rep),
        obs_cam=put(problem.obs_cam, obs_sharding),
        obs_pt=put(problem.obs_pt, obs_sharding),
        obs_uv=put(problem.obs_uv, obs_sharding),
        obs_ur=put(problem.obs_ur, obs_sharding),
        obs_inv_sigma2=put(problem.obs_inv_sigma2, obs_sharding),
        obs_valid=put(problem.obs_valid, obs_sharding),
    )


def distributed_bundle_adjust(
    problem: ba.BAProblem,
    cam: Camera,
    mesh: Mesh,
    lm_iters: int = 10,
    cg_iters: int = 20,
    robust: bool = True,
) -> ba.BAResult:
    """Shard, solve, return (result arrays are replicated)."""
    sharded = shard_problem(problem, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        result = ba.bundle_adjust(
            sharded, cam, lm_iters=lm_iters, cg_iters=cg_iters, robust=robust
        )
    # Trim any padding from the inlier mask.
    E = problem.obs_cam.shape[0]
    return result._replace(obs_inlier=result.obs_inlier[:E])
