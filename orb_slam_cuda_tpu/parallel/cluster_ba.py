"""Cluster-parallel map refinement: covisibility-block BA across a mesh.

The second distributed strategy next to the observation-sharded global BA
(dist_ba.py): the keyframe set is partitioned into covisibility clusters
(multihost.covisibility_clusters — temporal/covisibility locality), each
cluster becomes an independent local-BA problem whose frontier keyframes
are held fixed, and ALL cluster problems solve concurrently — one per
mesh device — as a vmapped `solvers.bundle_adjust` whose leading cluster
axis is sharded. One round is a block-coordinate descent step on the
global problem; alternating rounds with re-clustering converge toward the
joint optimum while keeping every solve device-local (no collectives
inside the solver — the TPU-native analog of running the reference's
LocalBundleAdjustment per covisibility window, src/Optimizer.cc:545-926,
on many hosts at once).

Use this when the map outgrows one device's appetite for a joint solve or
when clusters genuinely live on different hosts (multi-host mapping, the
BASELINE.json north star); use dist_ba for the exact joint solve at loop
closure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..geometry.camera import Camera
from ..slam_map import MapState, ops as map_ops
from ..solvers import bundle_adjust as ba
from .multihost import covisibility_clusters


@functools.partial(
    jax.jit, static_argnames=("n_clusters", "cams_per", "pts_per")
)
def _gather_cluster_problems(
    state: MapState,
    assign,  # (K,) int32 cluster id, -1 invalid
    level_inv_sigma2,
    n_clusters: int,
    cams_per: int,
    pts_per: int,
):
    """Build the stacked (D, ...) cluster BA problems.

    Per cluster: its keyframes are free cameras; keyframes of OTHER
    clusters observing its points join as fixed frontier cameras (up to
    half the camera budget); its point set is every point whose reference
    keyframe lies in the cluster (ownership by ref-KF makes the scatter
    write-conflict-free)."""
    K, N = state.kf_mp.shape
    P_ = state.mp_xyz.shape[0]
    inv_sig = jnp.asarray(level_inv_sigma2, jnp.float32)
    own_free = cams_per // 2
    n_fixed = cams_per - own_free

    def one(c):
        mine = (assign == c) & state.kf_valid
        cam_own = jnp.nonzero(mine, size=own_free, fill_value=-1)[0].astype(jnp.int32)

        # Owned points: ref keyframe in this cluster.
        ref = jnp.clip(state.mp_ref_kf, 0)
        owned = state.mp_valid & (state.mp_ref_kf >= 0) & mine[ref]
        pt_slots = jnp.nonzero(owned, size=pts_per, fill_value=-1)[0].astype(jnp.int32)
        pt_sel = jnp.zeros((P_,), bool).at[jnp.clip(pt_slots, 0)].max(pt_slots >= 0)

        # Frontier: foreign keyframes observing owned points.
        sees = (state.kf_mp >= 0) & pt_sel[jnp.clip(state.kf_mp, 0)]
        overlap = jnp.sum(sees, axis=1).astype(jnp.int32)
        overlap = jnp.where(mine | ~state.kf_valid, 0, overlap)
        fixed = map_ops.top_covisible(overlap, n_fixed)

        cam_slots = jnp.concatenate([cam_own, fixed])  # (cams_per,)
        cam_ok = cam_slots >= 0
        safe_cam = jnp.clip(cam_slots, 0)
        cam_fixed = jnp.concatenate(
            [jnp.zeros((own_free,), bool), jnp.ones((n_fixed,), bool)]
        )
        # Gauge: no frontier -> pin the oldest own camera.
        any_fixed = jnp.any(cam_fixed & cam_ok)
        oldest = jnp.argmin(
            jnp.where(
                cam_ok[:own_free],
                state.kf_frame_id[safe_cam[:own_free]],
                jnp.int32(2**30),
            )
        )
        cam_fixed = cam_fixed.at[oldest].set(cam_fixed[oldest] | ~any_fixed)

        inv = jnp.full((P_,), -1, jnp.int32).at[
            jnp.where(pt_slots >= 0, pt_slots, P_)
        ].set(jnp.arange(pts_per, dtype=jnp.int32), mode='drop')
        rows_mp = state.kf_mp[safe_cam]  # (cams_per, N)
        rows_valid = (
            (rows_mp >= 0) & cam_ok[:, None] & state.kf_feat_valid[safe_cam]
        )
        obs_pt_local = jnp.where(rows_valid, inv[jnp.clip(rows_mp, 0)], -1)
        rows_valid = rows_valid & (obs_pt_local >= 0)
        obs_cam = jnp.broadcast_to(
            jnp.arange(cams_per, dtype=jnp.int32)[:, None], (cams_per, N)
        )
        obs_isig = inv_sig[jnp.clip(state.kf_oct[safe_cam], 0, inv_sig.shape[0] - 1)]

        problem = ba.BAProblem(
            cam_pose=state.kf_pose[safe_cam],
            cam_fixed=cam_fixed | ~cam_ok,
            xyz=state.mp_xyz[jnp.clip(pt_slots, 0)],
            pt_valid=pt_slots >= 0,
            obs_cam=obs_cam.reshape(-1),
            obs_pt=obs_pt_local.reshape(-1),
            obs_uv=state.kf_uv[safe_cam].reshape(-1, 2),
            obs_ur=jnp.where(rows_valid, state.kf_right[safe_cam], -1.0).reshape(-1),
            obs_inv_sigma2=obs_isig.reshape(-1),
            obs_valid=rows_valid.reshape(-1),
        )
        return problem, cam_slots, pt_slots

    return jax.vmap(one)(jnp.arange(n_clusters, dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("lm_iters", "cg_iters"))
def _solve_and_scatter(state: MapState, problems, cam_slots, pt_slots,
                       cam: Camera, lm_iters: int, cg_iters: int):
    results = jax.vmap(
        lambda p: ba.bundle_adjust(p, cam, lm_iters=lm_iters, cg_iters=cg_iters)
    )(problems)

    # Scatter: free cameras and owned points only — ownership (cluster of
    # the camera / point's ref keyframe) makes the writes disjoint.
    cam_ok = (cam_slots >= 0) & ~problems.cam_fixed  # (D, cams_per)
    safe_cam = jnp.clip(cam_slots, 0)
    kf_pose = state.kf_pose.at[safe_cam.reshape(-1)].set(
        jnp.where(
            cam_ok.reshape(-1)[:, None, None],
            results.cam_pose.reshape(-1, 4, 4),
            state.kf_pose[safe_cam.reshape(-1)],
        )
    )
    pt_ok = pt_slots >= 0
    safe_pt = jnp.clip(pt_slots, 0)
    mp_xyz = state.mp_xyz.at[safe_pt.reshape(-1)].set(
        jnp.where(
            pt_ok.reshape(-1)[:, None],
            results.xyz.reshape(-1, 3),
            state.mp_xyz[safe_pt.reshape(-1)],
        )
    )
    return state._replace(kf_pose=kf_pose, mp_xyz=mp_xyz)


def cluster_block_ba(
    state: MapState,
    cam: Camera,
    level_inv_sigma2,
    mesh=None,
    n_clusters: int | None = None,
    rounds: int = 2,
    lm_iters: int = 5,
    cg_iters: int = 15,
    cams_per: int = 32,
    pts_per: int = 4096,
) -> MapState:
    """Refine the whole map by `rounds` of cluster-parallel block BA.

    With a mesh, the cluster axis is sharded so each device solves its
    own blocks; without one, the vmapped solve still batches all blocks
    into one dispatch."""
    if n_clusters is None:
        n_clusters = mesh.devices.size if mesh is not None else 4
    for _ in range(rounds):
        covis = np.asarray(state.covis)
        kf_valid = np.asarray(state.kf_valid)
        assign = covisibility_clusters(covis, kf_valid, n_clusters)
        assign_j = jnp.asarray(assign)
        problems, cam_slots, pt_slots = _gather_cluster_problems(
            state, assign_j, level_inv_sigma2, n_clusters, cams_per, pts_per
        )
        if mesh is not None:
            shard = NamedSharding(mesh, P(mesh.axis_names[0]))
            problems = jax.tree.map(lambda x: jax.device_put(x, shard), problems)
            cam_slots = jax.device_put(cam_slots, shard)
            pt_slots = jax.device_put(pt_slots, shard)
        state_in = state
        if mesh is not None:
            rep = NamedSharding(mesh, P())
            state_in = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        state_new = _solve_and_scatter(
            state_in, problems, cam_slots, pt_slots, cam, lm_iters, cg_iters
        )
        if mesh is not None:
            # Mesh -> home device in two hops (reshard to replicated,
            # then host pull): the mesh may span processes, where a
            # direct device_put to one local device rejects
            # non-fully-addressable arrays.
            rep = NamedSharding(mesh, P())
            state_new = jax.tree.map(
                lambda x: jax.device_put(x, rep), state_new
            )
            state_new = jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)), state_new
            )
        state = state_new
    return state
