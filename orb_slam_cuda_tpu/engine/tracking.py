"""Tracking: the per-frame front-end state machine.

Replaces the reference's `Tracking` engine (reference: src/Tracking.cc):
the host drives the NO_IMAGES_YET / NOT_INITIALIZED / OK / LOST state
machine (Tracking.h:59-65) and keyframe policy, while every compute step
— motion-model matching, reference-KF matching, local-map tracking, pose
optimization — is a jitted batched function over the map PyTree.

Data-dependent branching (which tracking mode ran, lost/recovered, new
keyframe decisions) stays host-side, mirroring SURVEY.md §7 hard part (e);
each branch body is a compiled function reused across frames.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from ..geometry import se3
from ..geometry.camera import Camera
from ..matching import search
from ..ops import hamming
from ..slam_map import MapState, ops as map_ops
from ..solvers import pose_opt
from .frame import FrameData

# Reference thresholds (src/Tracking.cc).
MOTION_MODEL_RADIUS = 15.0  # :965 th=15 (non-stereo)
MOTION_MODEL_RADIUS_STEREO = 7.0
MIN_MATCHES_MOTION = 20  # :977
MIN_INLIERS_TRACK = 10  # :1000
MIN_MATCHES_REF_KF = 15  # :849
MIN_INLIERS_LOCAL = 30  # :1049


def inv_level_sigma2(scale_factors, octave):
    """Per-observation information weight 1/sigma2[octave] from the
    configured pyramid scales (reference mvInvLevelSigma2,
    src/ORBextractor.cc ctor; used at src/Optimizer.cc:394-411) — NOT a
    hardcoded 1.2 table, so non-default scale_factor configs weight
    correctly."""
    sf = jnp.asarray(scale_factors, jnp.float32)
    sigma2 = sf * sf
    return 1.0 / sigma2[jnp.clip(octave, 0, sf.shape[0] - 1)]


class TrackCarry(NamedTuple):
    """Device-resident tracking recurrence: everything frame n+1's fused
    step needs from frame n, kept on device so the steady-state tracking
    chain crosses the host boundary only at the (lagged) scalar readback.
    `vel` is the constant-velocity model Tcw_n @ Twc_{n-1} (reference
    mVelocity, src/Tracking.cc:556-561); identity when unknown — the
    motion-model search then starts at the last pose and the fused step's
    widen/fallback ladder recovers, matching the reference's
    empty-mVelocity -> TrackReferenceKeyFrame route."""

    pose: jnp.ndarray  # (4,4) Tcw of the last tracked frame
    vel: jnp.ndarray  # (4,4) constant-velocity model
    uv: jnp.ndarray  # (N,2) last frame features
    oct: jnp.ndarray
    ang: jnp.ndarray
    bip: jnp.ndarray
    depth: jnp.ndarray  # (N,) last frame depths (<0 unknown; mono all <0)
    mp: jnp.ndarray  # (N,) last frame map-point bindings
    ref_kf: jnp.ndarray  # () int32


@jax.jit
def track_motion_model(
    state: MapState,
    frame: FrameData,
    pose_pred,
    last_uv,
    last_oct,
    last_ang,
    last_bip,
    last_mp,
    last_depth,
    pose_last,
    cam: Camera,
    scale_factors,
    radius,
    th_depth=jnp.float32(0.0),
):
    """TrackWithMotionModel (reference src/Tracking.cc:942-1006): project
    the last frame's bound map points at their *current* map positions
    into the predicted pose, window-match, then pose-only LM.

    Temporal VO points (reference UpdateLastFrame, src/Tracking.cc:
    911-941): close-depth features of the last frame that carry NO map
    binding are backprojected at the last pose and matched/optimized
    exactly like map points, but never enter the map or the bindings —
    they vanish when the carry refreshes, the array analogue of the
    reference deleting its temporal points each round (:911-916,
    mlpTemporalPoints). They densify pose tracking where the map is thin
    (stereo/RGBD only; mono depths are all <0 so the set is empty, the
    reference's :917 early-out). `th_depth` here gates ONLY this
    temporal set: the reference creates temporal points exclusively in
    localization-only mode (UpdateLastFrame early-returns on
    !mbOnlyTracking, src/Tracking.cc:884-885), so the System passes 0
    in full SLAM mode, disabling the set for parity (the close-point
    keyframe census uses its own th_depth in full_track_step)."""
    from ..geometry import camera as cam_mod

    is_map = last_mp >= 0
    valid_map = is_map & state.mp_valid[jnp.clip(last_mp, 0)]
    Xw_map = state.mp_xyz[jnp.clip(last_mp, 0)]
    is_temp = ~is_map & (last_depth > 0) & (last_depth < th_depth)
    Xw_temp = se3.transform(
        se3.inverse(pose_last),
        cam_mod.backproject(cam, last_uv, jnp.maximum(last_depth, 1e-6)),
    )
    Xw = jnp.where(is_map[:, None], Xw_map, Xw_temp)
    Xc = se3.transform(pose_pred, Xw)
    proj = cam_mod.project(cam, Xc)
    in_front = Xc[:, 2] > 0
    q_valid = (valid_map | is_temp) & in_front

    m = search.by_projection(
        proj, last_bip, q_valid, last_oct,
        frame.uv, frame.oct, frame.ang, frame.bip, frame.valid,
        scale_factors, radius=radius,
        q_ang=last_ang,
        max_dist=100.0, ratio=0.9, check_rotation=True,
    )
    # Bind: frame feature m.idx[q] <- point last_mp[q] (map queries only).
    n = frame.capacity
    mp_new = jnp.full((n,), -1, jnp.int32)
    ok = m.idx >= 0
    j = jnp.clip(m.idx, 0)
    mp_new = mp_new.at[j].set(
        jnp.where(ok & is_map, last_mp, mp_new[j])
    )
    # Temporal correspondences: per-frame-feature world anchors that join
    # the pose LM but produce no binding.
    temp_bound = jnp.zeros((n,), bool).at[j].max(ok & is_temp)
    temp_Xw = jnp.zeros((n, 3), jnp.float32).at[j].set(
        jnp.where((ok & is_temp)[:, None], Xw, 0.0)
    )
    n_matches = jnp.sum(ok)
    pose, mp_out, n_inl = _optimize_and_prune(
        state, frame, pose_pred, mp_new, cam, scale_factors,
        extra_Xw=temp_Xw, extra_bound=temp_bound,
    )
    return pose, mp_out, n_matches, n_inl


@jax.jit
def track_reference_kf(
    state: MapState,
    frame: FrameData,
    pose_init,
    ref_kf,
    cam: Camera,
    scale_factors,
):
    """TrackReferenceKeyFrame (reference src/Tracking.cc:830-875):
    BoW-gated matching against the reference keyframe's map points, then
    pose-only LM from the last frame's pose."""
    kf_bip = hamming.bipolar(state.kf_desc[ref_kf])
    kf_mp = state.kf_mp[ref_kf]
    kf_has_pt = (kf_mp >= 0) & state.mp_valid[jnp.clip(kf_mp, 0)]
    m = search.by_bow(
        state.kf_node[ref_kf], kf_bip, state.kf_feat_valid[ref_kf],
        state.kf_ang[ref_kf],
        frame.node, frame.bip, frame.valid, frame.ang,
        ratio=0.7, check_rotation=True, f1_has_point=kf_has_pt,
    )
    n = frame.capacity
    ok = m.idx >= 0
    mp_new = jnp.full((n,), -1, jnp.int32)
    mp_new = mp_new.at[jnp.where(ok, m.idx, n)].set(kf_mp, mode='drop')
    n_matches = jnp.sum(ok)
    pose, mp_out, n_inl = _optimize_and_prune(
        state, frame, pose_init, mp_new, cam, scale_factors
    )
    return pose, mp_out, n_matches, n_inl


def _optimize_and_prune(
    state, frame, pose0, mp, cam, scale_factors,
    extra_Xw=None, extra_bound=None,
):
    """Pose-only LM on current bindings + unbind chi2 outliers
    (the reference deletes outlier mvpMapPoints after PoseOptimization,
    src/Tracking.cc:986-999). `extra_Xw`/`extra_bound` add temporal VO
    correspondences (world anchors without map bindings) to the LM; the
    returned inlier count stays map-only, the reference's nmatchesMap
    gate (src/Tracking.cc:986-1005)."""
    bound = (mp >= 0) & frame.valid
    Xw = state.mp_xyz[jnp.clip(mp, 0)]
    if extra_bound is not None:
        eb = extra_bound & frame.valid & ~bound
        Xw = jnp.where(bound[:, None], Xw, extra_Xw)
        bound_all = bound | eb
    else:
        bound_all = bound
    inv_sigma2 = inv_level_sigma2(scale_factors, frame.oct)
    res = pose_opt.optimize_pose(
        pose0, Xw, frame.uv, frame.right, inv_sigma2, bound_all, cam
    )
    mp_out = jnp.where(res.inliers, mp, -1)
    n_inl = jnp.sum(res.inliers & (mp >= 0))
    return res.pose, mp_out, n_inl


@jax.jit
def track_vo_last_frame(
    frame: FrameData,
    last_uv,
    last_oct,
    last_ang,
    last_bip,
    last_depth,
    last_valid,
    pose_last,
    pose_pred,
    cam: Camera,
    scale_factors,
    radius,
):
    """Localization-mode visual odometry (the reference's mbVO path,
    src/Tracking.cc:383-470 + UpdateLastFrame's temporal points
    :911-941): when the map has drifted out of view, track frame-to-frame
    against 3D points backprojected from the LAST frame's own depth —
    no map involvement. Returns (pose, n_matches, n_inliers).

    Mono frames carry no depth (last_depth < 0 everywhere), so this path
    is inert for them — matching the reference, whose VO points exist
    only for stereo/RGBD (:917)."""
    from ..geometry import camera as cam_mod

    q_valid = last_valid & (last_depth > 0)
    Twc = se3.inverse(pose_last)
    Xc_last = cam_mod.backproject(cam, last_uv, jnp.maximum(last_depth, 1e-6))
    Xw = se3.transform(Twc, Xc_last)
    Xc = se3.transform(pose_pred, Xw)
    proj = cam_mod.project(cam, Xc)
    q_valid = q_valid & (Xc[:, 2] > 0)

    m = search.by_projection(
        proj, last_bip, q_valid, last_oct,
        frame.uv, frame.oct, frame.ang, frame.bip, frame.valid,
        scale_factors, radius=radius,
        q_ang=last_ang,
        max_dist=100.0, ratio=0.9, check_rotation=True,
    )
    ok = m.idx >= 0
    n_matches = jnp.sum(ok)
    # Pose-only LM on the VO correspondences.
    n = frame.capacity
    Xw_f = jnp.zeros((n, 3), jnp.float32)
    bound = jnp.zeros((n,), bool)
    j = jnp.clip(m.idx, 0)
    Xw_f = Xw_f.at[j].set(jnp.where(ok[:, None], Xw, Xw_f[j]))
    bound = bound.at[j].set(ok | bound[j])
    inv_sigma2 = inv_level_sigma2(scale_factors, frame.oct)
    res = pose_opt.optimize_pose(
        pose_pred, Xw_f, frame.uv, frame.right, inv_sigma2,
        bound & frame.valid, cam,
    )
    return res.pose, n_matches, res.n_inliers


@functools.partial(jax.jit, static_argnames=("max_local_kfs",))
def assemble_local_map(
    state: MapState,
    frame_mp,
    max_local_kfs: int = 20,
):
    """UpdateLocalKeyFrames + UpdateLocalPoints (reference
    src/Tracking.cc:1291-1426): keyframes sharing points with the current
    frame (+ their best covisible neighbors), then the union of their
    points.

    Returns (local_kf_mask (K,), local_pt_mask (P,), ref_kf best-sharing
    keyframe slot)."""
    counts = map_ops.covisibility_counts_for_bindings(state, frame_mp)  # (K,)
    sharing = counts > 0
    ref_kf = jnp.argmax(counts).astype(jnp.int32)
    # Keep the strongest max_local_kfs sharers.
    top = map_ops.top_covisible(counts, max_local_kfs)
    kf_mask = jnp.zeros_like(sharing).at[jnp.clip(top, 0)].max(top >= 0)
    kf_mask = kf_mask & sharing
    # Add each local KF's top-10 covisibility neighbors (reference adds
    # neighbors, parents, children; covisibility is the dominant term).
    # Incrementally-maintained weights (state.covis): reading them here
    # replaced a 7.75 ms/frame on-chip recompute.
    covis = state.covis
    neigh_w = jnp.max(jnp.where(kf_mask[:, None], covis, 0), axis=0)  # (K,)
    top_n = map_ops.top_covisible(neigh_w, 10)
    kf_mask = kf_mask.at[jnp.clip(top_n, 0)].max(top_n >= 0)
    kf_mask = kf_mask & state.kf_valid
    pt_mask = map_ops.points_of_keyframes(state, kf_mask)
    return kf_mask, pt_mask, ref_kf


@jax.jit
def track_local_map(
    state: MapState,
    frame: FrameData,
    pose,
    local_pt_mask,
    cam: Camera,
    scale_factors,
    radius,
):
    """SearchLocalPoints + pose refinement (reference
    src/Tracking.cc:1007-1290): frustum-cull the local points, window-match
    the unmatched ones into the frame, re-run pose-only LM with all
    bindings.

    Local points are processed densely over the full (P,) capacity with
    masks — the per-point `isInFrustum` loop (src/Frame.cc:268-325)
    becomes one batched projection.
    """
    from ..geometry import camera as cam_mod

    P = state.mp_xyz.shape[0]
    already = jnp.zeros((P,), bool).at[jnp.clip(frame.mp, 0)].max(frame.mp >= 0)
    cand = local_pt_mask & state.mp_valid & ~already

    Xc = se3.transform(pose, state.mp_xyz)
    proj = cam_mod.project(cam, Xc)
    in_img = (
        (proj[:, 0] >= 0) & (proj[:, 0] < cam.width)
        & (proj[:, 1] >= 0) & (proj[:, 1] < cam.height)
    )
    in_front = Xc[:, 2] > 0
    Rwc_t = -jnp.einsum("ij,j->i", pose[:3, :3].T, pose[:3, 3])
    vec = state.mp_xyz - Rwc_t[None, :]
    dist = jnp.linalg.norm(vec, axis=-1)
    # Reference band is [0.8 min, 1.2 max] (src/Frame.cc:297-301); widened
    # slightly because the sparser single-extractor map needs points to
    # survive longer retreats before triangulation refreshes the map.
    dist_ok = (dist >= state.mp_min_dist * 0.6) & (dist <= state.mp_max_dist * 1.6)
    view_cos = jnp.sum(vec * state.mp_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    view_ok = view_cos > 0.5  # reference viewingCosLimit=0.5
    visible = cand & in_front & in_img & dist_ok & view_ok

    n_lvls = len(scale_factors)
    pred_oct = search.predict_octave(
        dist, state.mp_max_dist, jnp.log(jnp.float32(scale_factors[1])), n_lvls
    )
    # Reference: r = 2.5 if viewCos > 0.998 else 4.0 (src/Tracking.cc:1246).
    r_scale = jnp.where(view_cos > 0.998, 2.5, 4.0) / 4.0

    mp_bip = hamming.bipolar(state.mp_desc)
    m = search.by_projection(
        proj, mp_bip, visible, pred_oct,
        frame.uv, frame.oct, frame.ang, frame.bip, frame.valid,
        scale_factors, radius=radius * 4.0,
        q_radius_scale=r_scale,
        # TH_HIGH=100: the reference's map->frame SearchByProjection
        # accepts up to TH_HIGH, NOT TH_LOW (src/ORBmatcher.cc:118
        # `bestDist<=TH_HIGH`). 50 here starved local-map tracking of
        # 2/3 of its true matches once viewpoints drifted a few degrees
        # from the distinctive descriptor's anchor view.
        max_dist=100.0, ratio=0.8,
        t_has_point=frame.mp >= 0,
    )
    N_t = frame.mp.shape[0]
    pt_ids = jnp.arange(P, dtype=jnp.int32)
    mp_new = frame.mp.at[jnp.where(m.idx >= 0, m.idx, N_t)].set(
        pt_ids, mode='drop'
    )
    pose2, mp_out, n_inl = _optimize_and_prune(
        state, frame, pose, mp_new, cam, scale_factors
    )
    n_visible = jnp.sum(visible)
    return pose2, mp_out, n_inl, n_visible, visible


class FullStepResult(NamedTuple):
    """Output of the fused per-frame step. `host_vec` is the ONE array
    the host pulls per frame — float32 (41,): the 9 state-machine
    scalars [track_ok, n_inliers_local, ref_kf, ref_tracked,
    n_matches_mm, n_inl_mm, used_fallback, n_tracked_close,
    n_nontracked_close] followed by the 4x4 frame pose (row-major) and
    the 4x4 current pose of the reference keyframe (the host stores the
    frame RELATIVE to it, so loop/GBA corrections propagate to the
    exported trajectory — reference src/Tracking.cc:554-576 +
    System::SaveTrajectoryTUM src/System.cc:361-430). Through a
    high-latency link every device->host transfer costs a round trip,
    so the scalars and the poses ride one transfer. `scalars`/`pose`
    stay on device for chaining."""

    pose: jnp.ndarray
    mp: jnp.ndarray
    mp_visible: jnp.ndarray
    mp_found: jnp.ndarray
    scalars: jnp.ndarray
    host_vec: jnp.ndarray


@jax.jit
def full_track_step(
    state: MapState,
    frame: FrameData,
    pose_pred,
    pose_last,
    last_uv, last_oct, last_ang, last_bip, last_mp, last_depth,
    ref_kf,
    min_obs,
    cam: Camera,
    scale_factors,
    radius_mm,
    th_depth=jnp.float32(0.0),
    vo_th_depth=jnp.float32(0.0),
):
    """The entire per-frame tracking pipeline as ONE device dispatch.

    `th_depth` feeds the stereo/RGBD close-point keyframe census;
    `vo_th_depth` gates the motion model's temporal VO points and is
    nonzero only in localization-only mode (reference src/Tracking.cc:
    884-885 creates temporal points only when mbOnlyTracking).

    Fuses motion-model tracking, the reference-keyframe fallback
    (lax.cond — only the needed branch runs), local-map assembly +
    tracking, visibility statistics and the NeedNewKeyFrame counters.
    The reference spreads this over Tracking::Track's sequential calls
    (src/Tracking.cc:325-578) with cheap function boundaries; on an
    accelerator every boundary is a host-device round trip, so the whole
    state machine body compiles into a single XLA program and the host
    reads back one small scalar vector per frame.
    """
    # CheckReplacedInLastFrame analog (reference src/Tracking.cc:330-345
    # plus the isBad() checks sprinkled through Track): the previous
    # frame's bindings may reference points the mapper has since culled
    # or merged away — in pipelined mode the carry is L frames stale
    # relative to `state`. Bindings to invalid slots must be dropped
    # before matching, or a culled-and-reused slot silently aliases a
    # different 3D point and corrupts the pose (and, at keyframe
    # creation, the map).
    last_mp = jnp.where(
        (last_mp >= 0) & state.mp_valid[jnp.clip(last_mp, 0)], last_mp, -1
    )

    # --- 1. motion model (with the reference's doubled-window retry when
    # matches run short, src/Tracking.cc:972-976) ---
    pose1, mp1, n_m1, n_i1 = track_motion_model.__wrapped__(
        state, frame, pose_pred, last_uv, last_oct, last_ang, last_bip,
        last_mp, last_depth, pose_last, cam, scale_factors, radius_mm,
        vo_th_depth,
    )

    def widen(_):
        return track_motion_model.__wrapped__(
            state, frame, pose_pred, last_uv, last_oct, last_ang, last_bip,
            last_mp, last_depth, pose_last, cam, scale_factors,
            2.0 * radius_mm, vo_th_depth,
        )

    pose1, mp1, n_m1, n_i1 = jax.lax.cond(
        n_m1 < MIN_MATCHES_MOTION,
        widen,
        lambda _: (pose1, mp1, n_m1, n_i1),
        None,
    )
    ok1 = (n_m1 >= MIN_MATCHES_MOTION) & (n_i1 >= MIN_INLIERS_TRACK)

    # --- 2. fallback: reference keyframe (only runs if needed) ---
    def keep(_):
        return pose1, mp1, n_m1, n_i1

    def fallback(_):
        return track_reference_kf.__wrapped__(
            state, frame, pose_last, ref_kf, cam, scale_factors
        )

    pose2, mp2, n_m2, n_i2 = jax.lax.cond(ok1, keep, fallback, None)
    ok2 = ok1 | ((n_m2 >= MIN_MATCHES_REF_KF) & (n_i2 >= MIN_INLIERS_TRACK))
    used_fallback = (~ok1).astype(jnp.int32)

    # --- 3. local map ---
    kf_mask, pt_mask, ref_kf_new = assemble_local_map.__wrapped__(
        state, mp2, 20
    )
    pose3, mp3, n_i3, n_vis, visible = track_local_map.__wrapped__(
        state, frame._replace(mp=mp2), pose2, pt_mask, cam,
        scale_factors, 1.0,
    )
    # Re-project R onto SO(3): in pipelined mode this pose chains
    # device-side through `vel @ pose` products whose rotation defect
    # otherwise compounds exponentially (see se3.orthonormalize).
    pose3 = se3.orthonormalize(pose3)
    ok3 = ok2 & (n_i3 >= MIN_INLIERS_LOCAL)
    # On a FAILED frame the bindings are empty, so argmax over zero
    # sharing counts names keyframe SLOT 0 as the "reference". Persist
    # the incoming ref instead: the next frame's TrackReferenceKeyFrame
    # fallback must anchor to the last GOOD reference keyframe
    # (reference keeps mpReferenceKF across failures, Tracking.cc:538) —
    # chaining the corrupted 0-ref through the pipelined carry pinned
    # every post-failure fallback to an arbitrary old keyframe and made
    # one failed frame permanent.
    ref_kf_new = jnp.where(ok3, ref_kf_new, ref_kf)

    # --- 4. visibility statistics (IncreaseVisible/IncreaseFound) ---
    P = state.mp_xyz.shape[0]
    mp_visible = state.mp_visible + visible.astype(jnp.float32)
    found_add = jnp.zeros((P,), jnp.float32).at[jnp.clip(mp3, 0)].add(
        (mp3 >= 0).astype(jnp.float32)
    )
    mp_found = state.mp_found + found_add

    # --- 5. keyframe-policy counters ---
    ref_tracked = count_ref_tracked.__wrapped__(state, ref_kf_new, min_obs)
    # Stereo/RGBD close-point census for bNeedToInsertClose (reference
    # src/Tracking.cc:1081-1097): close features (0 < depth < th_depth)
    # split into tracked (bound to an inlier map point) vs untracked.
    close = frame.valid & (frame.depth > 0) & (frame.depth < th_depth)
    n_close_tracked = jnp.sum(close & (mp3 >= 0)).astype(jnp.int32)
    n_close_untracked = jnp.sum(close & (mp3 < 0)).astype(jnp.int32)

    scalars = jnp.stack(
        [
            ok3.astype(jnp.int32),
            n_i3.astype(jnp.int32),
            ref_kf_new,
            ref_tracked.astype(jnp.int32),
            n_m1.astype(jnp.int32),
            n_i1.astype(jnp.int32),
            used_fallback,
            n_close_tracked,
            n_close_untracked,
        ]
    )
    host_vec = jnp.concatenate(
        [scalars.astype(jnp.float32), pose3.reshape(16),
         state.kf_pose[ref_kf_new].reshape(16)]
    )
    return FullStepResult(
        pose=pose3, mp=mp3, mp_visible=mp_visible, mp_found=mp_found,
        scalars=scalars, host_vec=host_vec,
    )


def fused_pipeline_step(
    state: MapState,
    image,
    carry: TrackCarry,
    min_obs,
    extract_impl,
    build_frame_fn,
    cam: Camera,
    scale_factors,
    radius_mm,
    th_depth=jnp.float32(0.0),
    vo_th_depth=jnp.float32(0.0),
):
    """Extraction + frame build + full tracking step + velocity update as
    ONE XLA program (jitted by the System over closures for the extractor
    and vocabulary). This is the pipelined hot path: the host dispatches
    one of these per frame and reads the scalar vector L frames later
    (engine/system.py), so the critical path per frame is the image push
    plus amortized round-trip latency — the TPU counterpart of the
    reference's tracking-thread/mapping-thread overlap
    (src/System.cc:106-124)."""
    feats = extract_impl(image)
    frame = build_frame_fn(feats)
    pose_pred = carry.vel @ carry.pose
    res = full_track_step.__wrapped__(
        state, frame, pose_pred, carry.pose,
        carry.uv, carry.oct, carry.ang, carry.bip, carry.mp, carry.depth,
        carry.ref_kf, min_obs, cam, scale_factors, radius_mm, th_depth,
        vo_th_depth,
    )
    ok = res.scalars[0] > 0
    vel_new = jnp.where(
        ok, res.pose @ se3.inverse(carry.pose), jnp.eye(4, dtype=jnp.float32)
    )
    pose_new = jnp.where(ok, res.pose, carry.pose)
    carry_new = TrackCarry(
        pose=pose_new, vel=vel_new,
        uv=frame.uv, oct=frame.oct, ang=frame.ang, bip=frame.bip,
        depth=frame.depth, mp=res.mp, ref_kf=res.scalars[2],
    )
    return frame, res, carry_new


@jax.jit
def count_ref_tracked(state: MapState, ref_kf, min_obs):
    """TrackedMapPoints of the reference KF (reference
    KeyFrame::TrackedMapPoints, src/KeyFrame.cc:222-243) for the
    NeedNewKeyFrame ratio."""
    obs = map_ops.observation_counts(state)
    mp = state.kf_mp[ref_kf]
    ok = (mp >= 0) & (obs[jnp.clip(mp, 0)] >= min_obs)
    return jnp.sum(ok)
