"""Relocalization: BoW candidate retrieval + guided matching + pose solve.

Replaces `Tracking::Relocalization` (reference: src/Tracking.cc:1427-1600):
candidates from the keyframe database, SearchByBoW per candidate, then
pose estimation against the candidate's map points. Candidates are tried
with the reference's own flow: SearchByBoW against the candidate's map
points, EPnP RANSAC (solvers/pnp.py) for the pose hypothesis, then a
projection-widened robust refinement (src/Tracking.cc:1473-1600).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Camera
from ..matching import search
from ..ops import hamming
from ..slam_map import MapState, keyframe_db, ops as map_ops
from . import tracking
from .frame import FrameData

MIN_BOW_MATCHES = 15  # reference src/Tracking.cc:1482
MIN_INLIERS_ACCEPT = 50  # reference :1585 (nGood >= 50)


def relocalize(
    state: MapState,
    db,
    frame: FrameData,
    cam: Camera,
    n_words: int,
    scale_factors,
    max_candidates: int = 5,
):
    """Try candidates best-score-first; return (pose, bindings, ok)."""
    wu, wt = keyframe_db.compute_bow_row(frame.word, frame.idf, frame.valid)
    q_dense = keyframe_db.dense_bow(wu, wt, n_words)
    covis = map_ops.covisibility_matrix(state)
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
        mp = mp.at[jnp.clip(m.idx, 0)].set(
            jnp.where(keep, kf_mp, mp[jnp.clip(m.idx, 0)])
        )
        pose = res.pose
        # Widen with a projection search from the recovered pose and
        # refine once more (reference does SearchByProjection with
        # th=10 after the first optimization, src/Tracking.cc:1520).
        pose2, mp2, n_inl2, _, _ = tracking.track_local_map(
            state, frame._replace(mp=mp), pose,
            state.mp_valid, cam, jnp.asarray(scale_factors), 2.0,
        )
        # Acceptance gate: the reference only relocalizes on nGood >= 50
        # (src/Tracking.cc:1585); weaker poses fall through to the next
        # candidate rather than being returned as tentative successes.
        if int(n_inl2) >= MIN_INLIERS_ACCEPT:
            return pose2, mp2, True
    return None, None, False
