"""Relocalization: BoW candidate retrieval + guided matching + pose solve.

Replaces `Tracking::Relocalization` (reference: src/Tracking.cc:1427-1600)
with the reference's full STAGED ladder per candidate:

  1. SearchByBoW against the candidate's map points (>=15 matches,
     :1480-1490);
  2. EPnP RANSAC for the pose hypothesis (solvers/pnp.py, :1473-1499);
  3. pose-only LM on the RANSAC inliers (:1500-1516);
  4. if nGood < 50: SearchByProjection over the candidate keyframe's
     REMAINING map points with a WIDE th=10 window / Hamming 100, then
     re-optimize (:1520-1542);
  5. if 30 <= nGood < 50: one NARROW th=3 / Hamming 64 retry around the
     improved pose, then a final optimization (:1545-1578);
  6. accept at nGood >= 50 (:1585).

Stages 3-5 fuse into ONE jitted dispatch per candidate
(`_staged_refine`): the widen/narrow ladder is two lax.cond branches, so
the host pulls a single (pose, bindings, nGood) per candidate instead of
round-tripping per stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.camera import Camera
from ..matching import search
from ..ops import hamming
from ..slam_map import MapState, keyframe_db, ops as map_ops
from . import tracking
from .frame import FrameData

MIN_BOW_MATCHES = 15  # reference src/Tracking.cc:1482
MIN_INLIERS_ACCEPT = 50  # reference :1585 (nGood >= 50)
NARROW_RETRY_MIN = 30  # reference :1545 (30 < nGood < 50 -> narrow retry)
WIDE_TH, WIDE_HAM = 10.0, 100.0  # reference :1520 SearchByProjection(10,100)
NARROW_TH, NARROW_HAM = 3.0, 64.0  # reference :1548 (3,64)


@jax.jit
def _staged_refine(
    state: MapState,
    frame: FrameData,
    kf,
    pose0,
    mp0,
    cam: Camera,
    scale_factors,
):
    """Stages 3-5 of the reference reloc ladder as one dispatch.

    Returns (pose, bindings, n_good)."""
    kf_mp = state.kf_mp[kf]
    kf_has = (kf_mp >= 0) & state.mp_valid[jnp.clip(kf_mp, 0)]
    kf_bip = hamming.bipolar(state.kf_desc[kf])
    kf_oct = state.kf_oct[kf]
    kf_feat_ok = state.kf_feat_valid[kf] & kf_has

    def optimize(pose, mp):
        return tracking._optimize_and_prune(
            state, frame, pose, mp, cam, scale_factors
        )

    pose1, mp1, n1 = optimize(pose0, mp0)

    def widen_search(pose, mp, radius, ham):
        """SearchByProjection(F, KF, sAlreadyFound, th, ORBdist)
        (reference src/ORBmatcher.cc:1472-1601): project the candidate
        keyframe's map points not already found into the frame and
        window-match."""
        P = state.mp_xyz.shape[0]
        already = jnp.zeros((P,), bool).at[jnp.clip(mp, 0)].max(mp >= 0)
        q_ok = kf_feat_ok & ~already[jnp.clip(kf_mp, 0)]
        Xw = state.mp_xyz[jnp.clip(kf_mp, 0)]
        Xc = se3.transform(pose, Xw)
        from ..geometry import camera as cam_mod

        proj = cam_mod.project(cam, Xc)
        q_ok = q_ok & (Xc[:, 2] > 0)
        m = search.by_projection(
            proj, kf_bip, q_ok, kf_oct,
            frame.uv, frame.oct, frame.ang, frame.bip, frame.valid,
            scale_factors, radius=radius,
            q_ang=state.kf_ang[kf],
            max_dist=ham, ratio=1.0, check_rotation=True,
            t_has_point=mp >= 0,
        )
        ok = m.idx >= 0
        N_t = mp.shape[0]
        mp_new = mp.at[jnp.where(ok, m.idx, N_t)].set(kf_mp, mode='drop')
        return mp_new

    def wide_stage(_):
        mp_w = widen_search(pose1, mp1, WIDE_TH, WIDE_HAM)
        pose2, mp2, n2 = optimize(pose1, mp_w)

        def narrow_stage(_):
            pose3, mp3, n3 = optimize(
                pose2, widen_search(pose2, mp2, NARROW_TH, NARROW_HAM)
            )
            return pose3, mp3, n3, n2

        return jax.lax.cond(
            (n2 >= NARROW_RETRY_MIN) & (n2 < MIN_INLIERS_ACCEPT),
            narrow_stage,
            lambda _: (pose2, mp2, n2, n2),
            None,
        )

    pose_f, mp_f, n_f, n_wide = jax.lax.cond(
        n1 < MIN_INLIERS_ACCEPT,
        wide_stage,
        lambda _: (pose1, mp1, n1, n1),
        None,
    )
    # n1/n_wide expose stage attribution (which rung of the ladder
    # reached the nGood>=50 acceptance) at zero extra dispatch cost.
    return pose_f, mp_f, n_f, n1, n_wide


def relocalize(
    state: MapState,
    db,
    frame: FrameData,
    cam: Camera,
    n_words: int,
    scale_factors,
    max_candidates: int = 5,
    stats: dict = None,
):
    """Try candidates best-score-first; return (pose, bindings, ok).

    `stats`, if given, accumulates stage attribution: which rung of the
    staged ladder produced the accepted pose ('bow' = stage-3 LM alone,
    'wide' = the th=10/Ham100 re-search, 'narrow' = the th=3/Ham64
    retry), plus 'fail' per exhausted query."""
    wu, wt = keyframe_db.compute_bow_row(frame.word, frame.idf, frame.valid)
    q_dense = keyframe_db.dense_bow(wu, wt, n_words)
    covis = state.covis
    cand_mask, scores = keyframe_db.detect_candidates(
        db, q_dense, jnp.zeros_like(db.valid), covis
    )
    cand_mask = np.asarray(cand_mask)
    scores_n = np.asarray(scores)
    order = np.argsort(-scores_n)
    cands = [int(k) for k in order if cand_mask[k]][:max_candidates]

    import jax

    from ..solvers import pnp as pnp_solver

    # Per-level sigma2 from the configured pyramid scales (reference
    # mvLevelSigma2, used at src/PnPsolver.cc:94-99).
    sig2 = jnp.asarray(scale_factors, jnp.float32) ** 2
    max_oct = sig2.shape[0] - 1

    for kf in cands:
        # BoW matching against the candidate's bound map points
        # (reference :1480-1490), then EPnP RANSAC on the 3D-2D set.
        kf_bip = hamming.bipolar(state.kf_desc[kf])
        kf_mp = state.kf_mp[kf]
        kf_has = (kf_mp >= 0) & state.mp_valid[jnp.clip(kf_mp, 0)]
        m = search.by_bow(
            state.kf_node[kf], kf_bip, state.kf_feat_valid[kf],
            state.kf_ang[kf],
            frame.node, frame.bip, frame.valid, frame.ang,
            ratio=0.75, check_rotation=True, f1_has_point=kf_has,
        )
        n_matches = int(np.asarray((m.idx >= 0).sum()))
        if n_matches < MIN_BOW_MATCHES:
            continue
        ok_pair = m.idx >= 0
        Xw = state.mp_xyz[jnp.clip(kf_mp, 0)]
        uv = frame.uv[jnp.clip(m.idx, 0)]
        oct_f = frame.oct[jnp.clip(m.idx, 0)]
        err_th2 = 5.991 * sig2[jnp.clip(oct_f, 0, max_oct)]
        res = pnp_solver.solve_pnp_ransac(
            Xw, uv, ok_pair & kf_has, err_th2, cam,
            jax.random.PRNGKey(kf),
        )
        if not bool(res.ok):
            continue
        # Bind inlier matches into the frame.
        n = frame.capacity
        mp = jnp.full((n,), -1, jnp.int32)
        keep = res.inliers & ok_pair
        mp = mp.at[jnp.where(keep, m.idx, n)].set(kf_mp, mode='drop')
        # Stages 3-5: optimize -> wide th=10 re-search -> re-optimize ->
        # narrow th=3 retry, ONE dispatch (reference
        # src/Tracking.cc:1500-1578).
        pose2, mp2, n_good, n_bow, n_wide = _staged_refine(
            state, frame, jnp.int32(kf), res.pose, mp, cam,
            jnp.asarray(scale_factors),
        )
        # Acceptance gate: the reference only relocalizes on nGood >= 50
        # (src/Tracking.cc:1585); weaker poses fall through to the next
        # candidate rather than being returned as tentative successes.
        if int(n_good) >= MIN_INLIERS_ACCEPT:
            if stats is not None:
                stage = (
                    "bow" if int(n_bow) >= MIN_INLIERS_ACCEPT
                    else "wide" if int(n_wide) >= MIN_INLIERS_ACCEPT
                    else "narrow"
                )
                stats[stage] = stats.get(stage, 0) + 1
            return pose2, mp2, True
    if stats is not None:
        stats["fail"] = stats.get("fail", 0) + 1
    return None, None, False
