"""Local mapping: keyframe processing, point creation, fusion, local BA,
culling.

Replaces the reference's `LocalMapping` thread (reference:
src/LocalMapping.cc): ProcessNewKeyFrame (:153-195), CreateNewMapPoints'
per-neighbor epipolar triangulation (:237-486), SearchInNeighbors fusion
(:487-571), LocalBundleAdjustment via solvers.bundle_adjust
(src/Optimizer.cc:545-926), MapPointCulling (:197-235) and
KeyFrameCulling (:668-736). The host drives the sequence; each step is a
jitted batched function. (The reference runs this on its own thread; here
the steps dispatch asynchronously to the device and the host only syncs
on the few scalars it branches on.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3, triangulate
from ..geometry.camera import Camera
from ..matching import search
from ..ops import hamming
from ..slam_map import MapConfig, MapState, keyframe_db, ops as map_ops, state as mstate
from ..solvers import bundle_adjust as ba


class PendingMapping:
    """In-flight mapping work for one keyframe: device futures awaiting
    their single host pull, plus the host context to interpret them.
    The reference's counterpart is the LocalMapping thread's private
    working set while Tracking runs concurrently."""

    __slots__ = (
        "kf_slot", "nb_arr", "n_used_arr", "cull_sel", "reds_dev",
        "slot_matrix", "probation_ids", "born", "cur",
        "problem", "result1", "cam_slots", "pt_slots",
        "aborted", "ba2_done",
    )

    def __init__(self, **kw):
        self.aborted = False
        self.ba2_done = False
        for k, v in kw.items():
            setattr(self, k, v)


class TriangulationResult(NamedTuple):
    xyz: jnp.ndarray  # (N,3) candidate points (world)
    ok: jnp.ndarray  # (N,) bool
    feat_new: jnp.ndarray  # (N,) feature idx in the new KF (= row index)
    feat_nb: jnp.ndarray  # (N,) matched feature idx in neighbor


@jax.jit
def triangulate_with_neighbor(
    state: MapState,
    kf_new,
    kf_nb,
    cam: Camera,
    scale_factors,
    level_sigma2,
) -> TriangulationResult:
    """Epipolar-matched two-view triangulation between the new keyframe
    and one covisibility neighbor (reference CreateNewMapPoints inner
    loop, src/LocalMapping.cc:270-486)."""
    K = cam.K
    T1 = state.kf_pose[kf_new]
    T2 = state.kf_pose[kf_nb]
    F12 = triangulate.fundamental_from_poses(K, T1, K, T2)

    mp1 = state.kf_mp[kf_new]
    mp2 = state.kf_mp[kf_nb]
    has1 = (mp1 >= 0) & state.mp_valid[jnp.clip(mp1, 0)]
    has2 = (mp2 >= 0) & state.mp_valid[jnp.clip(mp2, 0)]
    bip1 = hamming.bipolar(state.kf_desc[kf_new])
    bip2 = hamming.bipolar(state.kf_desc[kf_nb])

    # Epipole of cam2's center in image 1 is used by the reference to
    # reject near-epipole features; here computed in image 2 (center of
    # cam1 in image 2).
    C1w = -T1[:3, :3].T @ T1[:3, 3]
    C1_in_2 = T2[:3, :3] @ C1w + T2[:3, 3]
    from ..geometry import camera as cam_mod

    epipole2 = cam_mod.project(cam, C1_in_2[None, :])[0]

    m = search.for_triangulation(
        state.kf_node[kf_new], bip1, state.kf_feat_valid[kf_new],
        state.kf_ang[kf_new], state.kf_uv[kf_new], state.kf_oct[kf_new],
        state.kf_node[kf_nb], bip2, state.kf_feat_valid[kf_nb],
        state.kf_ang[kf_nb], state.kf_uv[kf_nb], state.kf_oct[kf_nb],
        F12, level_sigma2,
        epipole_uv=epipole2, scale_factors=scale_factors,
        f1_has_point=has1, f2_has_point=has2,
    )

    ok = m.idx >= 0
    j = jnp.clip(m.idx, 0)
    xy1 = state.kf_uv[kf_new]
    xy2 = state.kf_uv[kf_nb][j]
    P1 = triangulate.projection_matrix(K, T1)
    P2 = triangulate.projection_matrix(K, T2)
    X = triangulate.triangulate_dlt(P1, P2, xy1, xy2)
    z1, z2, cosp = triangulate.cheirality_and_parallax(X, T1, T2)

    # Reprojection chi2 gates in both views (reference :404-443).
    def reproj_err(T, xy):
        Xc = se3.transform(T, X)
        uv = cam_mod.project(cam, Xc)
        return jnp.sum((uv - xy) ** 2, axis=-1)

    sig2 = jnp.asarray(level_sigma2, jnp.float32)
    e1 = reproj_err(T1, xy1) / sig2[jnp.clip(state.kf_oct[kf_new], 0, sig2.shape[0] - 1)]
    e2 = reproj_err(T2, xy2) / sig2[jnp.clip(state.kf_oct[kf_nb][j], 0, sig2.shape[0] - 1)]

    # Scale-consistency check (reference :445-466): distance ratio between
    # the two views must agree with the octave scale ratio.
    C2w = -T2[:3, :3].T @ T2[:3, 3]
    d1 = jnp.linalg.norm(X - C1w[None, :], axis=-1)
    d2 = jnp.linalg.norm(X - C2w[None, :], axis=-1)
    ratio_dist = d1 / jnp.maximum(d2, 1e-9)
    sf = jnp.asarray(scale_factors, jnp.float32)
    ratio_oct = (
        sf[jnp.clip(state.kf_oct[kf_new], 0, sf.shape[0] - 1)]
        / sf[jnp.clip(state.kf_oct[kf_nb][j], 0, sf.shape[0] - 1)]
    )
    ratio_factor = 1.5 * jnp.float32(scale_factors[1])
    scale_ok = (ratio_dist < ratio_oct * ratio_factor) & (
        ratio_dist * ratio_factor > ratio_oct
    )

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    good = (
        ok & finite & (z1 > 0) & (z2 > 0) & (cosp < 0.9998)
        & (e1 < 5.991) & (e2 < 5.991) & scale_ok
    )
    feat_new = jnp.arange(X.shape[0], dtype=jnp.int32)
    return TriangulationResult(xyz=X, ok=good, feat_new=feat_new, feat_nb=m.idx)


@functools.partial(jax.jit, static_argnames=("max_new",))
def insert_triangulated(
    state: MapState,
    tri: TriangulationResult,
    slots,
    kf_new,
    kf_nb,
    max_new: int = 256,
):
    """Write up to `max_new` triangulated points into preallocated slots —
    fixed shapes (a traced `nonzero(size=...)` packs the survivors) so the
    per-keyframe point creation compiles once, not per count."""
    sel = jnp.nonzero(tri.ok, size=max_new, fill_value=-1)[0].astype(jnp.int32)
    valid = sel >= 0
    sel_c = jnp.clip(sel, 0)
    state = mstate.add_points(
        state,
        slots,
        tri.xyz[sel_c],
        valid,
        state.kf_desc[kf_new][sel_c],
        jnp.zeros((max_new, 3), jnp.float32),
        jnp.zeros((max_new,), jnp.float32),
        jnp.full((max_new,), 1e9, jnp.float32),
        jnp.full((max_new,), kf_new, jnp.int32),
        jnp.full((max_new,), kf_new, jnp.int32),
    )
    state = mstate.bind_observations(state, kf_new, sel_c, slots, valid)
    nb_feat = tri.feat_nb[sel_c]
    state = mstate.bind_observations(
        state, kf_nb, jnp.clip(nb_feat, 0), slots, valid & (nb_feat >= 0)
    )
    return state, jnp.sum(valid)


@functools.partial(jax.jit, static_argnames=("max_new",))
def create_depth_points(
    state: MapState,
    kf_slot,
    cam: Camera,
    th_depth,
    slots,
    max_new: int = 512,
):
    """Spawn map points for unbound close features of a stereo/RGBD
    keyframe (reference CreateNewKeyFrame depth branch,
    src/Tracking.cc:1170-1220: closest-first, all below ThDepth or the
    closest 100) — fixed shapes, one dispatch."""
    from ..geometry import camera as cam_mod
    from ..geometry import se3 as se3_mod

    depth = state.kf_depth[kf_slot]
    mp = state.kf_mp[kf_slot]
    fv = state.kf_feat_valid[kf_slot]
    cand = (depth > 0) & (mp < 0) & fv
    key = jnp.where(cand, depth, jnp.inf)
    order = jnp.argsort(key)
    sel = order[:max_new].astype(jnp.int32)
    rank = jnp.arange(max_new)
    valid = cand[sel] & ((depth[sel] < th_depth) | (rank < 100))

    T = state.kf_pose[kf_slot]
    Twc = se3_mod.inverse(T)
    Xc = cam_mod.backproject(cam, state.kf_uv[kf_slot][sel], depth[sel])
    xyz = se3_mod.transform(Twc, Xc)
    state = mstate.add_points(
        state, slots, xyz, valid,
        state.kf_desc[kf_slot][sel],
        jnp.zeros((max_new, 3), jnp.float32),
        jnp.zeros((max_new,), jnp.float32),
        jnp.full((max_new,), 1e9, jnp.float32),
        jnp.full((max_new,), kf_slot, jnp.int32),
        jnp.full((max_new,), kf_slot, jnp.int32),
    )
    state = mstate.bind_observations(state, kf_slot, sel, slots, valid)
    return state, jnp.sum(valid)


@functools.partial(jax.jit, static_argnames=("max_new",))
def triangulate_and_insert_all(
    state: MapState,
    kf_slot,
    neighbors,
    slot_matrix,
    cam: Camera,
    scale_factors,
    level_sigma2,
    max_new: int = 256,
):
    """CreateNewMapPoints over ALL covisibility neighbors in one dispatch:
    lax.scan over the (padded, -1 = absent) neighbor list, each step
    triangulating against one neighbor and inserting into its preallocated
    slot row. Returns (state, (NB,) used counts) — one host pull total."""

    def body(st, inp):
        nb, slots = inp
        nb_ok = nb >= 0
        nb_c = jnp.clip(nb, 0)
        tri = triangulate_with_neighbor(
            st, kf_slot, nb_c, cam, scale_factors, level_sigma2
        )
        tri = tri._replace(ok=tri.ok & nb_ok)
        st, n_used = insert_triangulated(
            st, tri, slots, kf_slot, nb_c, max_new=max_new
        )
        return st, n_used

    state, n_used = jax.lax.scan(body, state, (neighbors, slot_matrix))
    return state, n_used


@jax.jit
def fuse_all(state: MapState, kf_slot, neighbors, cam: Camera, scale_factors):
    """SearchInNeighbors fusion, both directions for every neighbor, as
    one scanned dispatch."""

    def body(st, nb):
        nb_ok = nb >= 0
        nb_c = jnp.clip(nb, 0)

        def do(st):
            st = fuse_pair(st, kf_slot, nb_c, cam, scale_factors)
            return fuse_pair(st, nb_c, kf_slot, cam, scale_factors)

        st = jax.lax.cond(nb_ok, do, lambda st: st, st)
        return st, None

    state, _ = jax.lax.scan(body, state, neighbors)
    return state


@jax.jit
def redundancy_all(state: MapState, neighbors):
    """KeyFrameCulling redundancy fractions for all neighbors at once."""
    return jax.vmap(
        lambda nb: jnp.where(
            nb >= 0, map_ops.keyframe_redundancy(state, jnp.clip(nb, 0)), 0.0
        )
    )(neighbors)


@jax.jit
def fuse_pair(state: MapState, kf_src, kf_dst, cam: Camera, scale_factors):
    """Fuse kf_src's points into kf_dst (one direction) as one dispatch."""
    pts = state.kf_mp[kf_src]
    m = fuse_into_keyframe(state, pts, kf_dst, cam, scale_factors)
    return apply_fusion(state, kf_dst, pts, m.idx)


@jax.jit
def covis_row(state: MapState, kf_slot):
    return state.covis[kf_slot]


@functools.partial(jax.jit, static_argnums=(2,))
def top_covis_neighbors(state: MapState, kf_slot, nb: int):
    """Top-nb covisibility neighbors of a keyframe, -1 padded — computed
    on device so neighbor selection adds no host round trip (reference
    GetBestCovisibilityKeyFrames, src/KeyFrame.cc:169-180)."""
    covis = state.covis[kf_slot]
    return map_ops.top_covisible(covis, nb)


@jax.jit
def gather_mask(mask, ids):
    """mask[ids] with -1 padding -> False (one small pull instead of the
    full (P,) mask through a high-latency link)."""
    return jnp.where(ids >= 0, mask[jnp.clip(ids, 0)], False)


@jax.jit
def fuse_into_keyframe(
    state: MapState,
    pt_candidates,  # (M,) point ids (-1 padded)
    kf_target,
    cam: Camera,
    scale_factors,
):
    """Project candidate points into a keyframe and find fusable feature
    matches (reference ORBmatcher::Fuse src/ORBmatcher.cc:825-1000).
    Returns MatchResult over the candidate list (target = feature idx)."""
    from ..geometry import camera as cam_mod

    T = state.kf_pose[kf_target]
    pv = (pt_candidates >= 0) & state.mp_valid[jnp.clip(pt_candidates, 0)]
    X = state.mp_xyz[jnp.clip(pt_candidates, 0)]
    Xc = se3.transform(T, X)
    proj = cam_mod.project(cam, Xc)
    in_front = Xc[:, 2] > 0
    in_img = (
        (proj[:, 0] >= 0) & (proj[:, 0] < cam.width)
        & (proj[:, 1] >= 0) & (proj[:, 1] < cam.height)
    )
    Cw = -T[:3, :3].T @ T[:3, 3]
    vec = X - Cw[None, :]
    dist = jnp.linalg.norm(vec, axis=-1)
    mind = state.mp_min_dist[jnp.clip(pt_candidates, 0)]
    maxd = state.mp_max_dist[jnp.clip(pt_candidates, 0)]
    normal = state.mp_normal[jnp.clip(pt_candidates, 0)]
    view_cos = jnp.sum(vec * normal, axis=-1) / jnp.maximum(dist, 1e-9)
    pv = pv & in_front & in_img & (dist >= 0.8 * mind) & (dist <= 1.2 * maxd) & (view_cos > 0.5)

    n_lvls = len(scale_factors)
    pred_oct = search.predict_octave(
        dist, maxd, jnp.log(jnp.float32(scale_factors[1])), n_lvls
    )
    bip = hamming.bipolar(state.mp_desc[jnp.clip(pt_candidates, 0)])
    return search.fuse(
        proj, bip, pv, pred_oct,
        state.kf_uv[kf_target], state.kf_oct[kf_target],
        hamming.bipolar(state.kf_desc[kf_target]), state.kf_feat_valid[kf_target],
        scale_factors, radius=3.0,
    )


@jax.jit
def apply_fusion(state: MapState, kf_target, pt_candidates, match_idx):
    """Apply fusion decisions (reference Fuse + MapPoint::Replace,
    src/MapPoint.cc:182-221): for each matched (point p, feature j of
    kf_target):
      * feature unbound -> bind to p;
      * feature bound to q != p -> merge: the point with more observations
        absorbs the other (all bindings of the loser rewritten).
    """
    P = state.mp_xyz.shape[0]
    ok = (match_idx >= 0) & (pt_candidates >= 0)
    j = jnp.clip(match_idx, 0)
    p = jnp.clip(pt_candidates, 0)
    row = state.kf_mp[kf_target]
    q = row[j]  # current binding of matched features (or -1)

    # Case 1: unbound -> bind.
    bind = ok & (q < 0)
    row = row.at[j].set(jnp.where(bind, p, row[j]))
    state = state._replace(kf_mp=state.kf_mp.at[kf_target].set(row))

    # Case 2: merge. Winner = more observations.
    obs = map_ops.observation_counts(state)
    merge = ok & (q >= 0) & (q != p)
    winner = jnp.where(obs[p] >= obs[jnp.clip(q, 0)], p, jnp.clip(q, 0))
    loser = jnp.where(obs[p] >= obs[jnp.clip(q, 0)], jnp.clip(q, 0), p)
    # Build replacement table: identity, then loser -> winner.
    table = jnp.arange(P, dtype=jnp.int32)
    table = table.at[jnp.where(merge, loser, P - 1)].set(
        jnp.where(merge, winner, table[jnp.where(merge, loser, P - 1)])
    )
    # Chase one level of chaining (a->b, b->c) for safety.
    table = table[table]
    kf_mp = jnp.where(state.kf_mp >= 0, table[jnp.clip(state.kf_mp, 0)], -1)
    mp_valid = state.mp_valid & (table == jnp.arange(P))
    state = state._replace(kf_mp=kf_mp, mp_valid=mp_valid)
    return _dedup_observations(state)


def _dedup_observations(state: MapState) -> MapState:
    """Enforce at most one feature per (keyframe, point): keep the
    lowest-index feature (the reference never creates duplicates because
    AddObservation checks mObservations.count; merging can).

    Row-local formulation: duplicates can only exist WITHIN a keyframe
    row, so each (N,) row is sorted by (point, feature) and the first
    occurrence per point group is kept — O(K*N log N) with (K,N) peak
    memory, instead of a (K,P) int32 `first` table (0.5 GB per dispatch
    on a capacity-grown map). Small maps keep the scatter-table path:
    the table is a few MB there and the scatter beats the sort on the
    keyframe-event critical path."""
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    feat_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (K, N))
    bound = state.kf_mp >= 0
    if K * P <= 16 * 1024 * 1024:  # table <= 64 MB int32
        pt = jnp.clip(state.kf_mp, 0)
        rows = jnp.arange(K)[:, None].repeat(N, 1)
        first = (
            jnp.full((K, P), N, jnp.int32)
            .at[rows, pt]
            .min(jnp.where(bound, feat_idx, N))
        )
        keep = bound & (feat_idx == first[rows, pt])
        return state._replace(kf_mp=jnp.where(keep, state.kf_mp, -1))
    pt = jnp.where(bound, state.kf_mp, P)  # unbound sorts last
    # Sort each row by point id; ties keep feature order (stable).
    order = jnp.argsort(pt, axis=1, stable=True)
    pt_sorted = jnp.take_along_axis(pt, order, axis=1)
    first_in_group = jnp.concatenate(
        [jnp.ones((K, 1), bool), pt_sorted[:, 1:] != pt_sorted[:, :-1]],
        axis=1,
    )
    keep = jnp.zeros((K, N), bool).at[
        jnp.broadcast_to(jnp.arange(K)[:, None], (K, N)).reshape(-1),
        order.reshape(-1),
    ].set(first_in_group.reshape(-1))
    keep = keep & bound
    return state._replace(kf_mp=jnp.where(keep, state.kf_mp, -1))


@functools.partial(jax.jit, static_argnames=("n_local", "n_fixed", "n_points"))
def gather_local_ba_problem(
    state: MapState,
    kf_new,
    cam: Camera,
    level_inv_sigma2,
    n_local: int = 16,
    n_fixed: int = 8,
    n_points: int = 4096,
):
    """Assemble the local-BA window (reference src/Optimizer.cc:550-637):
    the new KF + its covisible KFs are free cameras; keyframes outside the
    window observing local points join as fixed cameras; the edge list is
    the (C,N) slice of the observation table.

    Returns (problem, cam_slots (C,), pt_slots (n_points,))."""
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    row = state.covis[kf_new]  # (K,)
    top = map_ops.top_covisible(row, n_local - 1)  # (n_local-1,)
    local = jnp.concatenate([jnp.asarray([kf_new], jnp.int32), top])
    local_mask = jnp.zeros((K,), bool).at[jnp.clip(local, 0)].max(local >= 0)
    local_mask = local_mask & state.kf_valid

    pt_mask = map_ops.points_of_keyframes(state, local_mask)
    pt_slots = jnp.nonzero(pt_mask, size=n_points, fill_value=-1)[0].astype(jnp.int32)
    pt_sel = jnp.zeros((P,), bool).at[jnp.clip(pt_slots, 0)].max(pt_slots >= 0)

    # Fixed frontier: non-local KFs observing selected points.
    sees = (state.kf_mp >= 0) & pt_sel[jnp.clip(state.kf_mp, 0)]
    overlap = jnp.sum(sees, axis=1).astype(jnp.int32)
    overlap = jnp.where(local_mask | ~state.kf_valid, 0, overlap)
    fixed = map_ops.top_covisible(overlap, n_fixed)

    cam_slots = jnp.concatenate([local, fixed])  # (C,)
    C = cam_slots.shape[0]
    cam_ok = cam_slots >= 0
    safe_cam = jnp.clip(cam_slots, 0)
    cam_fixed = jnp.concatenate(
        [jnp.zeros((local.shape[0],), bool), jnp.ones((n_fixed,), bool)]
    )
    # Gauge: also fix the oldest local camera if few fixed cams exist
    # (reference fixes when <2 fixed, src/Optimizer.cc:147-ish for GBA;
    # local BA always has a frontier in practice).
    any_fixed = jnp.any(cam_fixed & cam_ok)
    oldest = jnp.argmin(
        jnp.where(
            local_mask[safe_cam[: local.shape[0]]] & cam_ok[: local.shape[0]],
            state.kf_frame_id[safe_cam[: local.shape[0]]],
            jnp.int32(2**30),
        )
    )
    cam_fixed = cam_fixed.at[oldest].set(cam_fixed[oldest] | ~any_fixed)

    # Point local index lookup.
    inv = jnp.full((P,), -1, jnp.int32).at[
        jnp.where(pt_slots >= 0, pt_slots, P)
    ].set(jnp.arange(n_points, dtype=jnp.int32), mode='drop')

    rows_mp = state.kf_mp[safe_cam]  # (C,N)
    rows_valid = (
        (rows_mp >= 0)
        & cam_ok[:, None]
        & state.kf_feat_valid[safe_cam]
    )
    obs_pt_local = jnp.where(rows_valid, inv[jnp.clip(rows_mp, 0)], -1)
    rows_valid = rows_valid & (obs_pt_local >= 0)
    obs_cam = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None], (C, N))

    inv_sig = jnp.asarray(level_inv_sigma2, jnp.float32)
    obs_isig = inv_sig[jnp.clip(state.kf_oct[safe_cam], 0, inv_sig.shape[0] - 1)]

    problem = ba.BAProblem(
        cam_pose=state.kf_pose[safe_cam],
        cam_fixed=cam_fixed | ~cam_ok,
        xyz=state.mp_xyz[jnp.clip(pt_slots, 0)],
        pt_valid=pt_slots >= 0,
        obs_cam=obs_cam.reshape(-1),
        obs_pt=obs_pt_local.reshape(-1),
        obs_uv=state.kf_uv[safe_cam].reshape(-1, 2),
        obs_ur=jnp.where(
            rows_valid, state.kf_right[safe_cam], -1.0
        ).reshape(-1),
        obs_inv_sigma2=obs_isig.reshape(-1),
        obs_valid=rows_valid.reshape(-1),
    )
    return problem, cam_slots, pt_slots


@jax.jit
def scatter_ba_result(
    state: MapState,
    result: ba.BAResult,
    problem: ba.BAProblem,
    cam_slots,
    pt_slots,
):
    """Write optimized poses/points back and unbind chi2-outlier
    observations (reference erases outlier edges after local BA,
    src/Optimizer.cc:860-905)."""
    K, N = state.kf_mp.shape
    C = cam_slots.shape[0]
    cam_ok = (cam_slots >= 0) & ~problem.cam_fixed
    safe_cam = jnp.clip(cam_slots, 0)
    new_poses = jnp.where(
        cam_ok[:, None, None], result.cam_pose, state.kf_pose[safe_cam]
    )
    kf_pose = state.kf_pose.at[safe_cam].set(new_poses)

    pt_ok = pt_slots >= 0
    safe_pt = jnp.clip(pt_slots, 0)
    new_xyz = jnp.where(pt_ok[:, None], result.xyz, state.mp_xyz[safe_pt])
    mp_xyz = state.mp_xyz.at[safe_pt].set(new_xyz)

    # Outlier pruning: edge (c_local, n) with valid obs but ~inlier.
    prune = (problem.obs_valid & ~result.obs_inlier).reshape(C, N)
    rows = state.kf_mp[safe_cam]
    rows = jnp.where(prune, -1, rows)
    kf_mp = state.kf_mp.at[safe_cam].set(
        jnp.where((cam_slots >= 0)[:, None], rows, state.kf_mp[safe_cam])
    )
    return state._replace(kf_pose=kf_pose, mp_xyz=mp_xyz, kf_mp=kf_mp)


class LocalMapper:
    """Host-side orchestration of the mapping steps for one new keyframe
    (the reference's LocalMapping::Run loop body, src/LocalMapping.cc:
    67-135, run synchronously per keyframe here; async dispatch is the
    engine-level roadmap)."""

    def __init__(self, cfg: MapConfig, cam: Camera, n_triangulate_neighbors=20,
                 n_fuse_neighbors=40,
                 lba_local=16, lba_fixed=8, lba_points=4096,
                 kf_cull_redundancy=0.9):
        # n_triangulate_neighbors: reference uses 20 covisibility
        # neighbors for mono, 10 otherwise (src/LocalMapping.cc:246).
        # n_fuse_neighbors: the reference fuses over those neighbors PLUS
        # up to 5 second-order neighbors each (src/LocalMapping.cc:
        # 497-515) — approximated here by a wider top-covisibility set.
        # Fusion breadth is what grants fresh triangulations their 3rd
        # observation before the 2-keyframe probation deadline; at 12
        # first-order-only targets, 36% of new points were culled for
        # obs<=2 and the map ran 10x thinner than the reference's.
        # kf_cull_redundancy: reference hardcodes 0.9 (src/LocalMapping.cc:
        # 668-736, "90% of the MapPoints it sees are seen in at least
        # other 3 keyframes"); exposed as a tunable.
        self.cfg = cfg
        self.cam = cam
        self.n_tri_nb = n_triangulate_neighbors
        self.n_fuse_nb = max(n_fuse_neighbors, n_triangulate_neighbors)
        self.kf_cull_redundancy = kf_cull_redundancy
        self.lba_local = lba_local
        self.lba_fixed = lba_fixed
        self.lba_points = lba_points
        self._next_pt_slot = 0  # rotating allocator (delays slot reuse)
        # Host mirror of state.mp_valid for slot allocation. It is
        # CONSERVATIVE: the host marks slots used when it hands them out
        # and free when it learns of culls; device-side invalidations it
        # has not observed (e.g. fusion Replace) only make it
        # over-estimate occupancy, never alias a live point. resync()
        # pulls the true mask when the mirror runs out of free slots.
        self.mp_valid_host = np.zeros(cfg.max_points, bool)
        sf = cfg.scale_factors
        self.scale_factors = jnp.asarray(sf, jnp.float32)
        self.level_sigma2 = jnp.asarray(cfg.level_sigma2, jnp.float32)
        self.level_inv_sigma2 = 1.0 / self.level_sigma2

    def note_points_added(self, slots):
        slots = np.asarray(slots, np.int64)
        if slots.size:
            self.mp_valid_host[slots] = True

    def note_points_erased(self, slots):
        slots = np.asarray(slots, np.int64)
        if slots.size:
            self.mp_valid_host[slots] = False

    def resync_point_mirror(self, state: MapState):
        """Pull the true occupancy mask (one transfer); used after map
        load/reset and when conservative drift exhausts the mirror."""
        self.mp_valid_host = np.asarray(state.mp_valid).copy()

    def peek_point_slots(self, state: MapState, n: int) -> np.ndarray:
        """Rotating free-slot candidates WITHOUT advancing the cursor:
        freshly-culled slots are reused LAST, so stale indices (old frame
        bindings, probation entries) cannot silently alias a new point.
        Allocation consults the host mirror — no device pull on the
        keyframe hot path."""
        free = np.flatnonzero(~self.mp_valid_host)
        if len(free) < n:
            self.resync_point_mirror(state)
            free = np.flatnonzero(~self.mp_valid_host)
        if len(free) < n:
            raise RuntimeError(
                f"map point capacity exhausted ({self.cfg.max_points}); "
                "raise MapConfig.max_points"
            )
        pos = np.searchsorted(free, self._next_pt_slot)
        free = np.concatenate([free[pos:], free[:pos]])
        return free[:n]

    def advance_point_slots(self, slots: np.ndarray, n_used: int):
        if n_used > 0:
            self._next_pt_slot = (int(slots[n_used - 1]) + 1) % self.cfg.max_points

    def free_point_slots(self, state: MapState, n: int) -> np.ndarray:
        sel = self.peek_point_slots(state, n)
        self.advance_point_slots(sel, n)
        return sel

    def dispatch_keyframe(self, state: MapState, kf_slot: int,
                          recent_pts: list, kf_order: list):
        """Dispatch the whole mapping chain for a new keyframe WITHOUT
        blocking: triangulation, fusion, point statistics, local BA
        round 1 (5 LM iterations, reference src/Optimizer.cc:782),
        probation culling and keyframe-cull redundancies all go to the
        device as futures. Returns (state, PendingMapping); the host-side
        bookkeeping happens later in finish_keyframe, and the 10-iteration
        BA round 2 (reference :833) in run_ba_round2 — the split gives
        the engine the reference's mbAbortBA cancellation point between
        rounds (src/LocalMapping.cc:141, src/Optimizer.cc:624-625).

        Slot accounting is conservative: the whole candidate matrix is
        marked used at dispatch; finish_keyframe frees the rows
        triangulation did not fill."""
        cam = self.cam
        NB = self.n_tri_nb
        # UpdateConnections for the NEW keyframe (reference
        # ProcessNewKeyFrame, src/LocalMapping.cc:153-195): its bindings
        # carried from tracking define the covisibility row the neighbor
        # selection below reads.
        state = map_ops.refresh_covis_rows(
            state, jnp.asarray([kf_slot], jnp.int32)
        )
        nb_fuse = top_covis_neighbors(state, np.int32(kf_slot), self.n_fuse_nb)
        nb_arr = nb_fuse[:NB]

        MAX_NEW = 256
        born = len(kf_order)
        slot_matrix = self.peek_point_slots(state, NB * MAX_NEW).reshape(NB, MAX_NEW)
        self.note_points_added(slot_matrix.ravel())
        self._next_pt_slot = (int(slot_matrix[-1, -1]) + 1) % self.cfg.max_points
        state, n_used_arr = triangulate_and_insert_all(
            state, np.int32(kf_slot), nb_arr,
            np.asarray(slot_matrix, np.int32), cam,
            self.scale_factors, self.level_sigma2, max_new=MAX_NEW,
        )

        # Fresh triangulations need normals/dist bounds/distinctive
        # descriptors BEFORE fusion — the reference computes them at
        # creation (pMP->ComputeDistinctiveDescriptors/UpdateNormalAndDepth,
        # src/LocalMapping.cc:237-486) so SearchInNeighbors sees real
        # stats. Fusing first left new points with zero normals
        # (view_cos=0 fails the 0.5 gate) and max_dist=1e9 (octave
        # prediction pinned to the top level): they could never fuse at
        # their own birth event, observation counts froze at 2, and the
        # keyframe policy's nRefMatches starved (round-5 diagnosis:
        # 177/248 points stuck at 2 obs on a 3-keyframe orbit; a correctly
        # ordered pass lifts 136 of them to >=3).
        state = map_ops.update_point_stats(state, self.cfg)

        # --- SearchInNeighbors fusion (both directions, one dispatch;
        # wide target set approximating the reference's first+second
        # order neighbors, src/LocalMapping.cc:497-515) ---
        state = fuse_all(state, np.int32(kf_slot), nb_fuse, cam, self.scale_factors)
        state = map_ops.update_point_stats(state, self.cfg)
        # Triangulation + fusion changed the observation rows of the new
        # keyframe AND its fusion targets: refresh their covisibility
        # (reference SearchInNeighbors ends with UpdateConnections,
        # src/LocalMapping.cc:565-571).
        state = map_ops.refresh_covis_rows(
            state,
            jnp.concatenate([jnp.asarray([kf_slot], jnp.int32), nb_fuse]),
        )

        # --- Local BA round 1 (5 iters, reference Optimizer.cc:782) ---
        problem, cam_slots, pt_slots = gather_local_ba_problem(
            state, kf_slot, cam, self.level_inv_sigma2,
            n_local=self.lba_local, n_fixed=self.lba_fixed,
            n_points=self.lba_points,
        )
        result1 = ba.bundle_adjust(problem, cam, lm_iters=5, cg_iters=15)
        state = scatter_ba_result(state, result1, problem, cam_slots, pt_slots)

        # --- MapPointCulling (probation list) ---
        # recent_pts holds (point_slot, kf_count_at_creation); ages are in
        # keyframe counts, matching the reference's mnCurrentKFid -
        # mnFirstKFid semantics and immune to slot recycling.
        cur = len(kf_order)
        probation_ids = np.fromiter(
            (p for p, _ in recent_pts), np.int32, count=len(recent_pts)
        )
        cull_sel = None
        if recent_pts:
            P = self.cfg.max_points
            probation = np.zeros(P, bool)
            age = np.zeros(P, np.int32)
            for p, b in recent_pts:
                probation[p] = True
                age[p] = cur - b
            cull = map_ops.cull_points(state, probation, age, th_obs=2)
            state = mstate.erase_points(state, cull)
            pad = 256
            while pad < len(probation_ids):
                pad *= 2
            ids_pad = np.full(pad, -1, np.int32)
            ids_pad[: len(probation_ids)] = probation_ids
            cull_sel = gather_mask(cull, ids_pad)

        # --- KeyFrameCulling redundancies (decision data only) ---
        reds_dev = None
        if len(kf_order) > 3:
            reds_dev = redundancy_all(state, nb_arr)

        pending = PendingMapping(
            kf_slot=kf_slot, nb_arr=nb_arr, n_used_arr=n_used_arr,
            cull_sel=cull_sel, reds_dev=reds_dev, slot_matrix=slot_matrix,
            probation_ids=probation_ids, born=born, cur=cur,
            problem=problem, result1=result1, cam_slots=cam_slots,
            pt_slots=pt_slots,
        )
        return state, pending

    def run_ba_round2(self, state: MapState, pending: "PendingMapping"):
        """Local BA round 2 (reference src/Optimizer.cc:795-833): drop the
        round-1 chi2 outliers from the edge set and run 10 more LM
        iterations. Skipped entirely when `pending.aborted` — the
        reference's mbAbortBA interruption (a new keyframe supersedes
        finishing the optimization)."""
        if pending.aborted or pending.ba2_done:
            return state
        pending.ba2_done = True
        r1 = pending.result1
        problem2 = pending.problem._replace(
            cam_pose=r1.cam_pose,
            xyz=r1.xyz,
            obs_valid=pending.problem.obs_valid & r1.obs_inlier,
        )
        result2 = ba.bundle_adjust(problem2, self.cam, lm_iters=10, cg_iters=15)
        return scatter_ba_result(
            state, result2, problem2, pending.cam_slots, pending.pt_slots
        )

    def finish_keyframe(self, state: MapState, db, pending: "PendingMapping",
                        recent_pts: list, kf_order: list,
                        protected: set = frozenset(), cull_log: list = None):
        """Consume the dispatched keyframe's ONE host pull and run the
        bookkeeping tail: probation updates, freeing unused point slots,
        and KeyFrameCulling decisions."""
        NB = self.n_tri_nb
        nb_host, n_used_host, cull_host, reds_host = jax.device_get(
            (pending.nb_arr, pending.n_used_arr, pending.cull_sel,
             pending.reds_dev)
        )
        slot_matrix = pending.slot_matrix
        born = pending.born
        cur = pending.cur

        for row in range(NB):
            n_u = int(n_used_host[row])
            recent_pts.extend((int(p), born) for p in slot_matrix[row, :n_u])
            # Free the unused tail of this row (conservatively marked used
            # at dispatch).
            self.note_points_erased(slot_matrix[row, n_u:])
        if cull_host is not None:
            probation_ids = pending.probation_ids
            culled = set(
                int(p) for p, dead in zip(probation_ids, cull_host) if dead
            )
            self.note_points_erased(np.fromiter(culled, np.int64, len(culled)))
            # Survivors stay on probation until 3 keyframes old
            # (reference :230-233).
            recent_pts[:] = [
                (p, b) for p, b in recent_pts
                if p not in culled and cur - b < 3
            ]

        # --- KeyFrameCulling on local neighbors ---
        # The origin keyframe is never culled (reference
        # src/LocalMapping.cc:683 skips mnId==0); kf_order[0] is the
        # origin since it can never be removed from the map. `protected`
        # adds loop-edge keyframes (reference SetNotErase/mspLoopEdges:
        # SetBadFlag refuses while loop edges exist, src/KeyFrame.cc:
        # 434-460) — culling one would orphan a persisted loop constraint.
        origin = kf_order[0] if kf_order else -1
        culled_now = []
        if reds_host is not None:
            for row, nb in enumerate(nb_host):
                nb = int(nb)
                if nb < 0 or nb == origin or nb in protected:
                    continue
                if reds_host[row] > self.kf_cull_redundancy:
                    state = mstate.erase_keyframe(state, nb)
                    db = keyframe_db.erase(db, nb)
                    if nb in kf_order:
                        kf_order.remove(nb)
                    culled_now.append(nb)

        # Trajectory repair chain: record each culled keyframe's relative
        # pose to the (live) keyframe being processed, so frames exported
        # relative to a culled reference recompose through a survivor —
        # the reference's parent-chain walk in SaveTrajectoryTUM
        # (src/System.cc:372-380 `while(pKF->isBad()) Trw = Trw*mTcp`).
        if culled_now and cull_log is not None:
            parent = int(pending.kf_slot)
            poses = np.asarray(
                jax.device_get(state.kf_pose[np.asarray(culled_now + [parent])]),
                np.float64,
            )
            T_parent_inv = np.linalg.inv(poses[-1])
            for i, nb in enumerate(culled_now):
                cull_log.append((nb, parent, poses[i] @ T_parent_inv))

        return state, db

    def process_keyframe(self, state: MapState, db, kf_slot: int,
                         recent_pts: list, kf_order: list,
                         protected: set = frozenset(), cull_log: list = None):
        """Synchronous triangulate-fuse-optimize-cull for one keyframe:
        dispatch + BA round 2 + finish back-to-back (the engine's async
        path interleaves these with tracking frames instead — see
        System._pump_background).

        Latency discipline: every step is dispatched asynchronously and
        the host pulls ONE batched tuple at the end (neighbor ids, used
        slot counts, probation culls, keyframe redundancies). Through a
        high-latency device link this is the difference between ~6 round
        trips per keyframe and 1."""
        state, pending = self.dispatch_keyframe(
            state, kf_slot, recent_pts, kf_order
        )
        state = self.run_ba_round2(state, pending)
        return self.finish_keyframe(
            state, db, pending, recent_pts, kf_order, protected, cull_log
        )


@jax.jit
def keyframe_redundancy_cached(state: MapState, kf_slot):
    return map_ops.keyframe_redundancy(state, kf_slot)
