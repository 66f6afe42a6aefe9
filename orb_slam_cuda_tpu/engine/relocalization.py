"""Relocalization: BoW candidate retrieval + guided matching + pose solve.

Replaces `Tracking::Relocalization` (reference: src/Tracking.cc:1427-1600):
candidates from the keyframe database, SearchByBoW per candidate, then
pose estimation against the candidate's map points. The reference runs
EPnP+RANSAC (src/PnPsolver.cc) before pose optimization; here the
candidate keyframe's pose seeds a robust pose-only LM directly (the LM's
Huber + outlier reclassification covers the RANSAC role for the
close-to-keyframe relocalizations that dominate; solvers/pnp.py provides
the full EPnP RANSAC used when no seed survives).
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

    for kf in cands:
        pose, mp, n_matches, n_inl = tracking.track_reference_kf(
            state, frame, state.kf_pose[kf], kf, cam
        )
        if int(n_matches) < MIN_BOW_MATCHES:
            continue
        if int(n_inl) >= MIN_INLIERS_ACCEPT:
            # Widen with a projection search from the recovered pose and
            # refine once more (reference does SearchByProjection with
            # th=10 after the first optimization, src/Tracking.cc:1520).
            pose2, mp2, n_inl2, _, _ = tracking.track_local_map(
                state, frame._replace(mp=mp), pose,
                state.mp_valid, cam, jnp.asarray(scale_factors), 2.0,
            )
            if int(n_inl2) >= MIN_INLIERS_ACCEPT:
                return pose2, mp2, True
            return pose, mp, True
    return None, None, False
