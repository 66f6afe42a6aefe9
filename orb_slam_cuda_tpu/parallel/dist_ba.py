"""Distributed bundle adjustment over a device mesh (shard_map).

The distributed capability (BASELINE.json north star; absent from the
single-GPU reference, whose only "distribution" is shelling out to the
CUDA pba driver, reference src/Optimizer.cc:61-73): the global-BA
problem is partitioned so that each device OWNS a contiguous block of
the point axis and holds ALL observations of its points, while the
(small) camera state is replicated. Under `jax.shard_map` the solver
(`solvers.bundle_adjust_impl(axis_name=...)`) then does every
point-sized and observation-sized computation device-locally; the only
cross-device traffic per LM/CG iteration is

  * the camera gradient/Hessian blocks `b_c (C,6)` / `H_cc (C,6,6)` and
    the matvec output `y_c (C,6)` — `psum` over ICI;
  * the point terms of the CG dot products and the total error —
    scalar `psum`s.

That is O(C) bytes per iteration, independent of points/observations —
the same quantities PBA reduces on one GPU (ComputeJtE, reference
Thirdparty/pba/src/pba/SparseBundleCU.cpp:1176-1215), reduced across
chips instead. An earlier GSPMD formulation replicated all point-sized
work onto every device (edges sharded, state replicated), which scaled
NEGATIVELY on shared-core meshes; this layout removes the replicated
work entirely.

Host-side partitioning (numpy, once per problem): points are split into
equal blocks by index; each observation is routed to its point's block;
per-device edge lists are padded to the max block load. `PartitionedBA`
keeps the permutation so inlier masks come back in input order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import Camera
from ..solvers import bundle_adjust as ba

_AXIS = "obs"


class PartitionedBA(NamedTuple):
    """A BAProblem laid out for an n-device mesh.

    `local` is a BAProblem whose obs arrays are (n*Emax, ...) — device d
    owns rows [d*Emax, (d+1)*Emax) — and whose point arrays are (Pp, 3/)
    with Pp = n*Pblk; `local.obs_pt` holds BLOCK-LOCAL indices.
    `obs_src` maps each padded row to its original observation index
    (-1 for padding); `n_obs`/`n_pts` are the original sizes."""

    local: ba.BAProblem
    obs_src: jnp.ndarray  # (n*Emax,) int32
    n_obs: int
    n_pts: int
    pblk: int


def partition_problem(problem: ba.BAProblem, mesh: Mesh) -> PartitionedBA:
    """Route observations to their point's block, pad, and place on the
    mesh. Invalid observations (obs_valid False / negative indices) are
    inert and distributed round-robin to balance padding."""
    n = int(mesh.devices.size)
    obs_pt = np.asarray(problem.obs_pt)
    obs_valid = np.asarray(problem.obs_valid)
    E = obs_pt.shape[0]
    Pn = int(problem.xyz.shape[0])
    pblk = -(-Pn // n)  # ceil
    Pp = pblk * n

    live = obs_valid & (obs_pt >= 0)
    dev = np.where(live, np.clip(obs_pt, 0, Pn - 1) // pblk, 0).astype(np.int64)
    dev[~live] = np.arange(np.count_nonzero(~live)) % n
    counts = np.bincount(dev, minlength=n)
    emax = int(counts.max()) if E else 1
    emax = max(8, -(-emax // 8) * 8)  # sublane-friendly padding

    # obs_src[d*emax + k] = original index of device d's k-th edge.
    obs_src = np.full((n * emax,), -1, np.int64)
    order = np.argsort(dev, kind="stable")
    slot = np.concatenate([np.arange(c) for c in counts]) if E else np.zeros(0, np.int64)
    obs_src[dev[order] * emax + slot] = order

    pad_row = obs_src < 0
    src = np.maximum(obs_src, 0)

    def take(x, fill):
        x = np.asarray(x)
        if x.shape[0] == 0:
            # Zero-observation problem: every row is padding; emit the
            # fill directly (x[src] on a shape-(0,) source would raise).
            return jnp.full((len(src),) + x.shape[1:], fill, x.dtype)
        out = x[src].copy()
        out[pad_row] = fill
        return jnp.asarray(out)

    if E:
        pt_local = obs_pt[src] - (np.clip(obs_pt[src], 0, Pn - 1) // pblk) * pblk
        pt_local = np.where(pad_row | (obs_pt[src] < 0), -1, pt_local).astype(np.int32)
    else:
        pt_local = np.full(len(src), -1, np.int32)

    xyz = np.zeros((Pp, 3), np.float32)
    xyz[:Pn] = np.asarray(problem.xyz)
    pt_valid = np.zeros((Pp,), bool)
    pt_valid[:Pn] = np.asarray(problem.pt_valid)

    sh_obs = NamedSharding(mesh, P(_AXIS))
    rep = NamedSharding(mesh, P())
    local = ba.BAProblem(
        cam_pose=jax.device_put(problem.cam_pose, rep),
        cam_fixed=jax.device_put(problem.cam_fixed, rep),
        xyz=jax.device_put(jnp.asarray(xyz), sh_obs),
        pt_valid=jax.device_put(jnp.asarray(pt_valid), sh_obs),
        obs_cam=jax.device_put(take(problem.obs_cam, -1).astype(jnp.int32), sh_obs),
        obs_pt=jax.device_put(jnp.asarray(pt_local), sh_obs),
        obs_uv=jax.device_put(take(problem.obs_uv, 0.0), sh_obs),
        obs_ur=jax.device_put(take(problem.obs_ur, -1.0), sh_obs),
        obs_inv_sigma2=jax.device_put(take(problem.obs_inv_sigma2, 1.0), sh_obs),
        obs_valid=jax.device_put(take(problem.obs_valid, False), sh_obs),
    )
    return PartitionedBA(
        local=local,
        obs_src=jax.device_put(jnp.asarray(obs_src, jnp.int32), sh_obs),
        n_obs=E,
        n_pts=Pn,
        pblk=pblk,
    )


@functools.lru_cache(maxsize=32)
def _make_solver(mesh: Mesh, lm_iters: int, cg_iters: int, robust: bool):
    """Jitted shard_map solve for one mesh/config. The per-device body
    is the single-device solver with `axis_name` set; camera state comes
    in replicated, point/obs state as this device's shard."""

    def body(local: ba.BAProblem, cam: Camera):
        return ba.bundle_adjust_impl(
            local, cam, lm_iters=lm_iters, cg_iters=cg_iters, robust=robust,
            axis_name=_AXIS,
        )

    spec = ba.BAProblem(
        cam_pose=P(), cam_fixed=P(),
        xyz=P(_AXIS), pt_valid=P(_AXIS),
        obs_cam=P(_AXIS), obs_pt=P(_AXIS), obs_uv=P(_AXIS), obs_ur=P(_AXIS),
        obs_inv_sigma2=P(_AXIS), obs_valid=P(_AXIS),
    )
    out_spec = ba.BAResult(
        cam_pose=P(), xyz=P(_AXIS), obs_inlier=P(_AXIS), final_error=P()
    )
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, P()),
        out_specs=out_spec,
        check_vma=False,
    )
    return jax.jit(mapped)


def solve_partitioned(
    part: PartitionedBA,
    cam: Camera,
    mesh: Mesh,
    lm_iters: int = 10,
    cg_iters: int = 20,
    robust: bool = True,
) -> ba.BAResult:
    """Solve an already-partitioned problem (no host work, no copies —
    call this in loops; the camera pose/point outputs stay on the mesh)."""
    solver = _make_solver(mesh, lm_iters, cg_iters, robust)
    res = solver(part.local, cam)
    # Un-permute the inlier mask to the input observation order. Padding
    # rows carry False onto a False-initialised array (max keeps real
    # rows' verdicts regardless of scatter order).
    inl = jnp.zeros((part.n_obs,), bool).at[jnp.clip(part.obs_src, 0)].max(
        res.obs_inlier & (part.obs_src >= 0)
    )
    return ba.BAResult(
        cam_pose=res.cam_pose,
        xyz=res.xyz[: part.n_pts],
        obs_inlier=inl,
        final_error=res.final_error,
    )


def distributed_bundle_adjust(
    problem: ba.BAProblem,
    cam: Camera,
    mesh: Mesh,
    lm_iters: int = 10,
    cg_iters: int = 20,
    robust: bool = True,
) -> ba.BAResult:
    """Partition, place, solve; results come back in input order."""
    part = partition_problem(problem, mesh)
    return solve_partitioned(
        part, cam, mesh, lm_iters=lm_iters, cg_iters=cg_iters, robust=robust
    )
