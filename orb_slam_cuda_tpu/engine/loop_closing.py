"""Loop closing: detection, Sim3 verification, loop fusion, essential-graph
optimization and global BA.

Replaces the reference's `LoopClosing` thread (reference:
src/LoopClosing.cc): DetectLoop's covisibility-consistency chaining
(:122-265, th=3 at :43), ComputeSim3's per-candidate BoW matching + Sim3
RANSAC (:267-440), CorrectLoop's Sim3 propagation to the covisibility
group, map-point rewrite, fusion, essential-graph optimization and the
global-BA pass (:441-807). The reference runs this on its own thread and
spawns a 4th thread for GBA; here it runs at keyframe rate on the host
with all heavy steps jitted (see engine/system.py note on asynchrony).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3, sim3
from ..geometry.camera import Camera
from ..matching import search
from ..ops import hamming
from ..slam_map import MapConfig, MapState, keyframe_db, ops as map_ops
from ..solvers import bundle_adjust as ba
from ..solvers import pose_graph, sim3_opt, sim3_solver
from . import local_mapping

CONSISTENCY_TH = 3  # reference mnCovisibilityConsistencyTh (LoopClosing.cc:43)


class GBAPending:
    """In-flight global BA (the reference's GBA thread state,
    src/LoopClosing.cc:700-807): the dispatched solve's device futures
    plus the snapshots finish_global_ba needs to apply it safely after
    tracked frames and keyframes have interleaved.

    The solve runs as host-pumped CHUNKS of a few LM iterations each
    (`problem`/`iters_done`): between chunks a superseding loop can
    abort the remainder — the reference's mbStopGBA mid-solve
    interruption (src/LoopClosing.cc:455-470,716-717) at chunk
    granularity, where a monolithic 10-iteration dispatch could only
    discard the finished result."""

    __slots__ = ("idx", "result", "kfs", "kf_gen_snap", "pt_snap",
                 "problem", "iters_done", "cam_slots")

    def __init__(self, idx, result, kfs, kf_gen_snap, pt_snap,
                 problem=None, iters_done=0, cam_slots=None):
        self.idx = idx
        self.result = result
        self.kfs = kfs
        self.problem = problem
        self.iters_done = iters_done
        self.cam_slots = cam_slots
        self.kf_gen_snap = kf_gen_snap
        self.pt_snap = pt_snap


@jax.jit
def _apply_gba(state: MapState, gba_pose, gba_xyz, kf_apply, pt_apply,
               chain_child, chain_parent):
    """Scatter a finished global BA into the CURRENT map state.

    kf_apply: (K,) keyframes taking their GBA pose directly.
    pt_apply: (P,) points taking their GBA position directly.
    chain_child/chain_parent: (M,) -1-padded catch-up chain — keyframes
    created during the solve, corrected child-after-parent in insertion
    order (reference spanning-tree propagation, src/LoopClosing.cc:
    742-770). Remaining points re-anchor through their reference
    keyframe's (old, corrected) pose pair (:771-795)."""
    corrected = jnp.where(kf_apply[:, None, None], gba_pose, state.kf_pose)
    changed = kf_apply

    def chain_body(i, carry):
        corr, chg = carry
        c = chain_child[i]
        p = chain_parent[i]
        ok = (c >= 0) & (p >= 0)
        cs = jnp.clip(c, 0)
        ps = jnp.clip(p, 0)
        Tc = state.kf_pose[cs] @ se3.inverse(state.kf_pose[ps]) @ corr[ps]
        corr = corr.at[cs].set(jnp.where(ok, Tc, corr[cs]))
        chg = chg.at[cs].set(chg[cs] | ok)
        return corr, chg

    corrected, changed = jax.lax.fori_loop(
        0, chain_child.shape[0], chain_body, (corrected, changed)
    )

    # Points: direct GBA result, else re-anchor via the reference KF.
    xyz = jnp.where(pt_apply[:, None], gba_xyz, state.mp_xyz)
    ref = jnp.clip(state.mp_ref_kf, 0)
    R_old = state.kf_pose[ref][:, :3, :3]
    t_old = state.kf_pose[ref][:, :3, 3]
    p_cam = jnp.einsum("pij,pj->pi", R_old, xyz) + t_old
    R_new = corrected[ref][:, :3, :3]
    t_new = corrected[ref][:, :3, 3]
    p_re = jnp.einsum("pji,pj->pi", R_new, p_cam - t_new)
    fix = state.mp_valid & ~pt_apply & changed[ref]
    xyz = jnp.where(fix[:, None], p_re, xyz)

    kf_pose = jnp.where(changed[:, None, None], corrected, state.kf_pose)
    return state._replace(kf_pose=kf_pose, mp_xyz=xyz)
MIN_SIM3_INLIERS = 20  # reference :383
MIN_OPT_INLIERS = 20  # reference: OptimizeSim3 result gate (LoopClosing.cc:369)
MIN_TOTAL_MATCHES = 40  # reference: projection-gate floor (LoopClosing.cc:427)
COVIS_EDGE_MIN_WEIGHT = 100  # reference Optimizer.cc:1090


@functools.partial(jax.jit, static_argnames=("n_words",))
def _bow_scores_vs_neighbors(db, state: MapState, kf_slot, n_words):
    """Min BoW score between the keyframe and its covisibility neighbors
    (the loop-candidate floor, reference LoopClosing.cc:146-165)."""
    q = keyframe_db.dense_bow(db.word[kf_slot], db.weight[kf_slot], n_words)
    s = keyframe_db.scores(db, q)
    # FRESH covisibility, not the incrementally-maintained state.covis:
    # loop detection is keyframe-rate (staleness costs nothing here) and
    # its exclusion/grouping margins proved sensitive to the incremental
    # rows' tolerated drift (the circuit fixture's marginal Sim3 funnel
    # flipped from pass to fail on it).
    covis = map_ops.covisibility_matrix(state)
    neigh = (covis[kf_slot] >= 15) & db.valid
    min_score = jnp.min(jnp.where(neigh, s, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 1.0)
    return q, s, covis, neigh, min_score


def _project_points_into_kf(state, pts_xyz, pts_valid, pts_min_d, pts_max_d,
                            S_cam, cam, scale_factors):
    """Project world/camera-frame points through a Sim3 into a keyframe
    image; returns (proj (M,2), pred_octave (M,), gate mask (M,)) with the
    reference's depth/image/scale-band gates (src/ORBmatcher.cc:1148-1186)."""
    y = sim3.transform(S_cam, pts_xyz)
    z_ok = y[:, 2] > 1e-6
    z = jnp.where(z_ok, y[:, 2], 1.0)
    u = cam.fx * y[:, 0] / z + cam.cx
    v = cam.fy * y[:, 1] / z + cam.cy
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    dist = jnp.linalg.norm(y, axis=-1)
    band = (dist >= 0.8 * pts_min_d) & (dist <= 1.2 * pts_max_d)
    sf = jnp.asarray(scale_factors, jnp.float32)
    pred = search.predict_octave(
        dist, pts_max_d, jnp.log(sf[1]), sf.shape[0]
    )
    gate = pts_valid & z_ok & in_img & band
    return jnp.stack([u, v], axis=-1), pred, gate


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def sim3_search_and_refine(
    state: MapState, kf1, kf2, R0, t0, s0, prior_feat,
    cam: Camera, scale_factors, fix_scale: bool = False,
):
    """SearchBySim3 + OptimizeSim3 as ONE dispatch.

    SearchBySim3 (reference src/ORBmatcher.cc:1102-1327): project each
    keyframe's bound map points through the Sim3 estimate into the OTHER
    keyframe's image, window-match (th=7.5, octaves [pred-1, pred],
    TH_HIGH, no ratio), and keep mutually-agreeing pairs; features already
    matched by the RANSAC inliers are skipped. The two per-point loops
    become two batched projection searches plus a mutual-index check.

    OptimizeSim3 (src/Optimizer.cc:1190-1417) then refines S12 jointly
    over the combined correspondences (solvers/sim3_opt.py).

    prior_feat: (N,) kf2-feature index matched to each kf1 feature by the
    Sim3-RANSAC inlier set, or -1.
    Returns (R, t, s, n_inliers, feat12) where feat12 is the (N,)
    combined per-kf1-feature match (kf2 feature index or -1) surviving
    the optimization.
    """
    S12 = (R0, t0, s0)
    S21 = sim3.inverse(S12)
    T1 = state.kf_pose[kf1]
    T2 = state.kf_pose[kf2]
    mp1 = state.kf_mp[kf1]
    mp2 = state.kf_mp[kf2]
    p1 = jnp.clip(mp1, 0)
    p2 = jnp.clip(mp2, 0)
    has1 = (mp1 >= 0) & state.mp_valid[p1]
    has2 = (mp2 >= 0) & state.mp_valid[p2]
    already1 = prior_feat >= 0
    N = mp1.shape[0]
    already2 = jnp.zeros((N,), bool).at[jnp.clip(prior_feat, 0)].max(already1)

    sf = jnp.asarray(scale_factors, jnp.float32)

    # Direction 1: kf1 points -> kf2 image (reference :1148-1225).
    x1c = se3.transform(T1, state.mp_xyz[p1])
    proj1, pred1, gate1 = _project_points_into_kf(
        state, x1c, has1 & ~already1,
        state.mp_min_dist[p1], state.mp_max_dist[p1], S21, cam, sf,
    )
    m1 = search.by_projection(
        proj1, hamming.bipolar(state.mp_desc[p1]), gate1, pred1,
        state.kf_uv[kf2], state.kf_oct[kf2],
        jnp.zeros((N,), jnp.float32), hamming.bipolar(state.kf_desc[kf2]),
        state.kf_feat_valid[kf2],
        sf, radius=7.5, max_dist=100.0, ratio=1.0,
        octave_lo_off=-1, octave_hi_off=0, check_rotation=False,
    )
    # Direction 2: kf2 points -> kf1 image (reference :1227-1305).
    x2c = se3.transform(T2, state.mp_xyz[p2])
    proj2, pred2, gate2 = _project_points_into_kf(
        state, x2c, has2 & ~already2,
        state.mp_min_dist[p2], state.mp_max_dist[p2], S12, cam, sf,
    )
    m2 = search.by_projection(
        proj2, hamming.bipolar(state.mp_desc[p2]), gate2, pred2,
        state.kf_uv[kf1], state.kf_oct[kf1],
        jnp.zeros((N,), jnp.float32), hamming.bipolar(state.kf_desc[kf1]),
        state.kf_feat_valid[kf1],
        sf, radius=7.5, max_dist=100.0, ratio=1.0,
        octave_lo_off=-1, octave_hi_off=0, check_rotation=False,
    )
    # Mutual agreement (reference :1307-1325).
    j2 = jnp.clip(m1.idx, 0)
    mutual = (m1.idx >= 0) & (m2.idx[j2] == jnp.arange(N, dtype=jnp.int32))
    feat12 = jnp.where(already1, prior_feat, jnp.where(mutual, m1.idx, -1))

    # --- OptimizeSim3 over the combined correspondences ---
    # A pair needs BOTH its own point in kf1 and the matched point in kf2
    # (reference src/Optimizer.cc:1246-1280).
    jm = jnp.clip(feat12, 0)
    q2 = jnp.clip(mp2[jm], 0)
    pair_ok = (feat12 >= 0) & has1 & has2[jm]
    x2c_m = se3.transform(T2, state.mp_xyz[q2])
    # Information from the configured pyramid scales (reference
    # mvInvLevelSigma2, src/Optimizer.cc:1270-1299).
    max_oct = sf.shape[0] - 1
    inv_sig = 1.0 / (jnp.asarray(sf, jnp.float32) ** 2)
    oct1 = jnp.clip(state.kf_oct[kf1], 0, max_oct)
    oct2 = jnp.clip(state.kf_oct[kf2][jm], 0, max_oct)
    res = sim3_opt.optimize_sim3(
        S12, x1c, x2c_m,
        state.kf_uv[kf1], state.kf_uv[kf2][jm],
        inv_sig[oct1], inv_sig[oct2],
        pair_ok, cam, fix_scale=fix_scale, th2=10.0,
    )
    feat_out = jnp.where(pair_ok & res.inliers, feat12, -1)
    return res.R, res.t, res.s, res.n_inliers, feat_out


@jax.jit
def loop_group_point_count(state: MapState, cand):
    """(count, loop_kfs mask) for the loop keyframe's covisibility-group
    point set — lets the host size the projection-gate bucket to the
    TRUE occupancy instead of silently truncating at a fixed cap
    (the reference iterates ALL loop-group points,
    src/LoopClosing.cc:462-476)."""
    covis = map_ops.covisibility_matrix(state)  # fresh: see _bow_scores
    loop_kfs = ((covis[cand] >= 15) | (jnp.arange(covis.shape[0]) == cand)) & state.kf_valid
    pts_mask = map_ops.points_of_keyframes(state, loop_kfs) & state.mp_valid
    return jnp.sum(pts_mask).astype(jnp.int32), loop_kfs


def pow2_bucket(n: int, lo: int, hi: int) -> int:
    """Smallest power-of-two >= n, clamped to [lo, hi] — bounds the
    jit-recompile variants to log2(hi/lo) sizes."""
    b = lo
    while b < min(n, hi):
        b *= 2
    return min(b, hi)


@functools.partial(jax.jit, static_argnames=('n_pts_bucket',))
def loop_points_projection_gate(
    state: MapState, kf_cur, cand, R, t, s, feat_matched, cam, scale_factors,
    loop_kfs, n_pts_bucket: int = 4096,
):
    """The final acceptance gate (reference src/LoopClosing.cc:391-440):
    collect the map points of the loop keyframe's covisibility group,
    project them through Scw = S_cm ∘ T_mw into the current keyframe
    (SearchByProjection Scw variant, src/ORBmatcher.cc:290-404, th=10,
    TH_LOW, view-cos 0.5) and count total matched features.

    `n_pts_bucket` is host-sized to the true group occupancy via
    loop_group_point_count + pow2_bucket (no silent subset).

    Returns (n_total, point_match (N,) point id per current-KF feature).
    """
    pts_mask = map_ops.points_of_keyframes(state, loop_kfs)
    P = state.mp_xyz.shape[0]
    M = min(n_pts_bucket, P)
    pts = jnp.nonzero(pts_mask & state.mp_valid, size=M, fill_value=-1)[0].astype(jnp.int32)
    pv = pts >= 0
    pc = jnp.clip(pts, 0)

    # Scw = S_cm ∘ S_mw (reference LoopClosing.cc:372-374).
    S_cw = sim3.compose((R, t, s), sim3.from_se3(state.kf_pose[cand]))
    sf = jnp.asarray(scale_factors, jnp.float32)

    # Camera-center distance for the scale band + viewing angle
    # (reference src/ORBmatcher.cc:330-357: dist/normal use world frame).
    Rc, tc, sc = S_cw
    Ow = -(jnp.swapaxes(Rc, -1, -2) @ (tc / sc)[..., None])[..., 0]
    vec = state.mp_xyz[pc] - Ow[None, :]
    dist_w = jnp.linalg.norm(vec, axis=-1)
    view_cos = jnp.sum(vec * state.mp_normal[pc], axis=-1) / jnp.maximum(dist_w, 1e-9)

    y = sim3.transform(S_cw, state.mp_xyz[pc])
    z_ok = y[:, 2] > 1e-6
    z = jnp.where(z_ok, y[:, 2], 1.0)
    u = cam.fx * y[:, 0] / z + cam.cx
    v = cam.fy * y[:, 1] / z + cam.cy
    in_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    band = (dist_w >= 0.8 * state.mp_min_dist[pc]) & (dist_w <= 1.2 * state.mp_max_dist[pc])
    pred = search.predict_octave(dist_w, state.mp_max_dist[pc], jnp.log(sf[1]), sf.shape[0])

    # Skip points already matched by the Sim3 stage (spAlreadyFound).
    mp2 = state.kf_mp[cand]
    jm = jnp.clip(feat_matched, 0)
    matched_pts = jnp.where(feat_matched >= 0, mp2[jm], -1)
    already_pt = jnp.zeros((P,), bool).at[jnp.clip(matched_pts, 0)].max(matched_pts >= 0)
    q_valid = pv & z_ok & in_img & band & (view_cos > 0.5) & ~already_pt[pc]

    # Features already matched are excluded targets (vpMatched[idx] check).
    N = mp2.shape[0]
    feat_taken = jnp.zeros((N,), bool).at[jnp.clip(feat_matched, 0)].max(feat_matched >= 0)
    m = search.by_projection(
        jnp.stack([u, v], axis=-1), hamming.bipolar(state.mp_desc[pc]),
        q_valid, pred,
        state.kf_uv[kf_cur], state.kf_oct[kf_cur],
        jnp.zeros((N,), jnp.float32), hamming.bipolar(state.kf_desc[kf_cur]),
        state.kf_feat_valid[kf_cur],
        sf, radius=10.0, max_dist=50.0, ratio=1.0,
        octave_lo_off=-1, octave_hi_off=1, check_rotation=False,
        t_has_point=feat_taken,
    )
    # Combined per-feature point matches: Sim3-stage matches + projections.
    point_match = jnp.full((N,), -1, jnp.int32)
    point_match = point_match.at[jnp.where(m.idx >= 0, m.idx, N)].set(
        pts, mode='drop'
    )
    point_match = jnp.where(feat_matched >= 0, jnp.where(matched_pts >= 0, matched_pts, point_match), point_match)
    n_total = jnp.sum(point_match >= 0)
    return n_total.astype(jnp.int32), point_match


class LoopCloser:
    def __init__(self, cfg: MapConfig, cam: Camera, vocab, fix_scale: bool = False,
                 run_global_ba: bool = True, mesh=None):
        self.cfg = cfg
        self.cam = cam
        self.vocab = vocab
        self.fix_scale = fix_scale
        self.run_global_ba = run_global_ba
        # Optional jax.sharding.Mesh: global BA runs observation-sharded
        # across it (parallel/dist_ba.py) instead of on one device.
        self.mesh = mesh
        self.scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
        self.consistent_groups: List[Tuple[set, int]] = []
        # Monotonic keyframe-insertion counter for the recent-loop
        # cooldown (reference mLastLoopKFid+10, src/LoopClosing.cc:133).
        # Counted here, NOT via len(kf_order): keyframe culling removes
        # entries from kf_order, so its length is not a clock.
        self.kf_seen: int = 0
        self.last_loop_kf_seen: int = -(10**9)
        self.n_loops_closed = 0
        # Persisted loop constraints (reference KeyFrame::mspLoopEdges,
        # src/KeyFrame.cc:556-567): every past loop's (kf_a, kf_b) pair is
        # re-added to every later essential-graph solve
        # (src/Optimizer.cc:1040-1056) — without this a second loop
        # closure forgets the first one's constraint.
        self.loop_edges: List[Tuple[int, int]] = []
        # GBA generation counter (reference mnFullBAIdx, src/LoopClosing.
        # cc:455-470,716-717): each accepted loop bumps it; a pending
        # global BA whose captured index no longer matches was superseded
        # by a newer loop and its result is discarded.
        self.gba_idx = 0
        # Set by finish_detect when a loop correction wants a global BA;
        # the engine turns it into separate dispatch/finish background
        # units (the reference's 4th thread, src/LoopClosing.cc:631).
        self.gba_requested = False

    # ------------------------------------------------------------------
    def process(self, state: MapState, db, kf_slot: int, kf_order: List[int]):
        """DetectLoop → ComputeSim3 → CorrectLoop → GBA for one new
        keyframe (synchronous form: dispatch + finish back-to-back; the
        engine's async path defers the finishes and interleaves tracked
        frames — see System._pump_background)."""
        pending = self.dispatch_detect(state, db, kf_slot, kf_order)
        if pending is None:
            return state, db
        state, db = self.finish_detect(state, db, pending, kf_order)
        if self.gba_requested:
            self.gba_requested = False
            gba = self.dispatch_global_ba(state, kf_order)
            while not self.continue_global_ba(gba):
                pass
            state = self.finish_global_ba(state, gba, kf_order)
        return state, db

    def dispatch_detect(self, state: MapState, db, kf_slot: int,
                        kf_order: List[int]):
        """Dispatch the BoW candidate retrieval for a new keyframe without
        blocking (the reference's LoopClosing thread polls its queue at
        5 ms, src/LoopClosing.cc:76-107 — detection always lags keyframe
        insertion there too). Returns an opaque pending tuple or None when
        detection is skipped."""
        self.kf_seen += 1
        if len(kf_order) < 10:  # reference: map <10 KFs -> skip (:131)
            self.consistent_groups = []
            return None
        # Recent-loop cooldown (reference: mLastLoopKFid+10, :133).
        if self.kf_seen - self.last_loop_kf_seen < 10:
            # Consistency requires CONSECUTIVE detections; groups from
            # before a skipped round must not survive the gap.
            self.consistent_groups = []
            return None
        q, s, covis, neigh, min_score = _bow_scores_vs_neighbors(
            db, state, kf_slot, self.vocab.n_words
        )
        exclude = jnp.zeros_like(db.valid).at[kf_slot].set(True) | neigh
        cand_mask, _ = keyframe_db.detect_candidates(
            db, q, exclude, covis, min_score=min_score
        )
        return (kf_slot, cand_mask, covis)

    def finish_detect(self, state: MapState, db, pending,
                      kf_order: List[int]):
        """Consume a dispatched detection: pull the candidate mask, run
        consistency chaining, and — on a consistent hit — the full
        verification funnel + loop correction (synchronously; actual loop
        closures are rare)."""
        kf_slot, cand_mask, covis = pending
        cands = self._consistency_chain(cand_mask, covis)
        if not cands:
            return state, db

        hit = self._compute_sim3(state, kf_slot, cands)
        if hit is None:
            return state, db
        cand_kf, S_cm, inlier_pairs = hit

        state = self._correct_loop(state, kf_slot, cand_kf, S_cm, kf_order)
        self.loop_edges.append((min(kf_slot, cand_kf), max(kf_slot, cand_kf)))
        self.last_loop_kf_seen = self.kf_seen
        self.n_loops_closed += 1
        self.consistent_groups = []
        # Supersede any in-flight global BA (reference aborts the running
        # GBA thread when correcting a new loop, src/LoopClosing.cc:
        # 455-470) and request a fresh one for this correction.
        self.gba_idx += 1
        self.gba_requested = self.run_global_ba
        return state, db

    # ------------------------------------------------------------------
    def _detect(self, state: MapState, db, kf_slot: int) -> List[int]:
        """Synchronous DetectLoop (reference :122-265): BoW candidates
        above the neighbor-score floor + consistency chaining (dispatch +
        pull back-to-back; the engine's async path splits them)."""
        q, s, covis, neigh, min_score = _bow_scores_vs_neighbors(
            db, state, kf_slot, self.vocab.n_words
        )
        exclude = jnp.zeros_like(db.valid).at[kf_slot].set(True) | neigh
        cand_mask, _ = keyframe_db.detect_candidates(
            db, q, exclude, covis, min_score=min_score
        )
        return self._consistency_chain(cand_mask, covis)

    # ------------------------------------------------------------------
    def _consistency_chain(self, cand_mask, covis) -> List[int]:
        """DetectLoop's covisibility-consistency chaining (reference
        :184-245): a candidate group must recur in CONSISTENCY_TH
        consecutive detections. Pulls the candidate mask (one small
        transfer); covisibility rows only cross the link when candidates
        exist."""
        cand_ids = np.flatnonzero(np.asarray(cand_mask))
        if len(cand_ids) == 0:
            # Common path: one small (K,) pull per keyframe; the (K,K)
            # covisibility matrix only crosses the link when candidates
            # exist (tunnel RTT discipline).
            self.consistent_groups = []
            return []
        covis_rows = np.asarray(covis[jnp.asarray(cand_ids)])

        # Consistency chaining (reference :184-245).
        enough: List[int] = []
        new_groups: List[Tuple[set, int]] = []
        for row, c in enumerate(cand_ids):
            group = set(np.flatnonzero(covis_rows[row] > 0).tolist()) | {int(c)}
            best_count = 0
            matched_any = False
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    matched_any = True
                    best_count = max(best_count, count + 1)
            new_groups.append((group, best_count))
            if best_count >= CONSISTENCY_TH:
                enough.append(int(c))
            if not matched_any:
                new_groups[-1] = (group, 0)
        self.consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------
    def _compute_sim3(self, state: MapState, kf_slot: int, cands: List[int]):
        """ComputeSim3 (reference :267-440): per candidate, BoW-gated
        matching between the two keyframes' map points, then Sim3 RANSAC
        on the corresponding 3D points with bidirectional reprojection
        gating."""
        bip1 = hamming.bipolar(state.kf_desc[kf_slot])
        # One batched pull of the current keyframe's rows + sigma table.
        mp1, oct1 = jax.device_get(
            (state.kf_mp[kf_slot], state.kf_oct[kf_slot])
        )
        sig2 = np.asarray(self.cfg.level_sigma2, np.float32)
        for cand in cands:
            bip2 = hamming.bipolar(state.kf_desc[cand])
            mp2_row = state.kf_mp[cand]
            has1 = (state.kf_mp[kf_slot] >= 0) & state.mp_valid[
                jnp.clip(state.kf_mp[kf_slot], 0)
            ]
            has2 = (mp2_row >= 0) & state.mp_valid[jnp.clip(mp2_row, 0)]
            m = search.by_bow(
                state.kf_node[kf_slot], bip1, state.kf_feat_valid[kf_slot],
                state.kf_ang[kf_slot],
                state.kf_node[cand], bip2, state.kf_feat_valid[cand],
                state.kf_ang[cand],
                ratio=0.75, check_rotation=True,
                f1_has_point=has1, f2_has_point=None,
            )
            # ONE pull per candidate for all host decisions.
            idx, has2_n, mp2, oct2_row = jax.device_get(
                (m.idx, has2, mp2_row, state.kf_oct[cand])
            )
            # Valid correspondences: feature i (with point) of kf matched
            # to feature j with point in cand.
            j = np.clip(idx, 0, None)
            pair_ok = (idx >= 0) & (mp1 >= 0) & has2_n[j]
            if pair_ok.sum() < MIN_SIM3_INLIERS:
                continue

            p1 = np.clip(mp1, 0, None)
            p2 = mp2[j]
            T1 = state.kf_pose[kf_slot]
            T2 = state.kf_pose[cand]
            x1 = se3.transform(T1, state.mp_xyz[jnp.asarray(p1)])
            x2 = se3.transform(T2, state.mp_xyz[jnp.asarray(np.clip(p2, 0, None))])
            uv1 = state.kf_uv[kf_slot]
            uv2 = state.kf_uv[cand][jnp.asarray(j)]
            oct2 = oct2_row[j]
            th1 = 9.210 * sig2[np.clip(oct1, 0, len(sig2) - 1)]
            th2 = 9.210 * sig2[np.clip(oct2, 0, len(sig2) - 1)]

            res = sim3_solver.solve_sim3_ransac(
                x1, x2, uv1, uv2, jnp.asarray(pair_ok), self.cam,
                jax.random.PRNGKey(int(kf_slot) * 131 + int(cand)),
                jnp.asarray(th1), jnp.asarray(th2),
                fix_scale=self.fix_scale, min_inliers=MIN_SIM3_INLIERS,
            )
            # Single pull of the verdict + inlier mask.
            ok, inl = jax.device_get((res.ok, res.inliers))
            if not bool(ok):
                continue

            # --- Guided refinement (reference LoopClosing.cc:358-369):
            # SearchBySim3 widens the correspondence set through the
            # RANSAC estimate, OptimizeSim3 refines jointly; accept at
            # >=20 surviving inliers. One fused dispatch + one pull.
            prior_feat = np.where(pair_ok & inl, idx, -1).astype(np.int32)
            R_r, t_r, s_r, n_in, feat12 = sim3_search_and_refine(
                state, np.int32(kf_slot), np.int32(cand),
                res.R, res.t, res.s, jnp.asarray(prior_feat),
                self.cam, self.scale_factors, fix_scale=self.fix_scale,
            )
            if int(n_in) < MIN_OPT_INLIERS:
                continue

            # --- Projection acceptance gate (reference :391-440): project
            # the loop group's map points through the refined Scw; demand
            # >=40 total matches. Two dispatches + two pulls (the count
            # pull sizes the bucket so the gate sees EVERY group point).
            n_grp, loop_kfs = loop_group_point_count(state, np.int32(cand))
            bucket = pow2_bucket(int(n_grp), 4096, self.cfg.max_points)
            n_total, point_match = loop_points_projection_gate(
                state, np.int32(kf_slot), np.int32(cand),
                R_r, t_r, s_r, feat12, self.cam, self.scale_factors,
                loop_kfs, n_pts_bucket=bucket,
            )
            if int(n_total) < MIN_TOTAL_MATCHES:
                continue

            S_cm = (R_r, t_r, s_r)  # cand-frame -> current-frame
            return cand, S_cm, point_match
        return None

    # ------------------------------------------------------------------
    def _correct_loop(self, state: MapState, kf_slot: int, cand: int,
                      S_cm, kf_order: List[int]) -> MapState:
        """CorrectLoop (reference :441-638) + essential-graph optimization
        (src/Optimizer.cc:927-1189) + global BA (:48-93)."""
        K = self.cfg.max_keyframes
        covis = np.asarray(map_ops.covisibility_matrix(state))  # fresh
        # Snapshot PRE-correction poses: essential-graph measurements must
        # come from these (the reference's NonCorrectedSim3 map,
        # src/LoopClosing.cc:488-504) — measuring from corrected poses
        # would bake the correction jump into the odometry edges.
        pose_before = state.kf_pose

        # Corrected Sim3 of the current KF: S_corr = S_cm ∘ S_mw.
        T_mw = state.kf_pose[cand]
        S_mw = sim3.from_se3(T_mw)
        S_corr_cw = sim3.compose(S_cm, S_mw)

        # Propagate to the current covisibility group (reference :492-504)
        kf_valid = np.asarray(state.kf_valid)  # one pull, filters the group
        group = set(np.flatnonzero(covis[kf_slot] > 0).tolist()) | {kf_slot}
        group = [g for g in group if kf_valid[g]]
        T_cw_old = state.kf_pose[kf_slot]
        corrected: dict = {}
        for g in group:
            T_gw = state.kf_pose[g]
            # S_gc = T_gw ∘ T_cw^-1 (relative SE3, s=1).
            T_gc = T_gw @ se3.inverse(T_cw_old)
            S_gc = sim3.from_se3(T_gc)
            corrected[g] = sim3.compose(S_gc, S_corr_cw)

        # Rewrite the group's map points: p' = S_new^{-1}(S_old(p))
        # (reference :506-540).
        pt_mask = np.zeros(self.cfg.max_points, bool)
        kf_mp = np.asarray(state.kf_mp)
        xyz = state.mp_xyz
        done = np.zeros(self.cfg.max_points, bool)
        for g in group:
            pts = kf_mp[g]
            pts = pts[pts >= 0]
            pts = pts[~done[pts]]
            done[pts] = True
            if len(pts) == 0:
                continue
            S_old = sim3.from_se3(state.kf_pose[g])
            S_new = corrected[g]
            pj = jnp.asarray(pts)
            p_cam = sim3.transform(S_old, xyz[pj])
            p_new = sim3.transform(sim3.inverse(S_new), p_cam)
            xyz = xyz.at[pj].set(p_new)
        state = state._replace(mp_xyz=xyz)

        # Update group poses to the corrected (scale-folded) SE3.
        kf_pose = state.kf_pose
        for g in group:
            kf_pose = kf_pose.at[g].set(sim3.to_se3(corrected[g]))
        state = state._replace(kf_pose=kf_pose)

        # SearchAndFuse (reference :639-670): fuse the loop side's points
        # into the corrected group keyframes.
        loop_group = set(np.flatnonzero(covis[cand] > 0).tolist()) | {cand}
        loop_pts_mask = map_ops.points_of_keyframes(
            state,
            jnp.zeros((K,), bool).at[jnp.asarray(sorted(loop_group))].set(True),
        )
        n_loop_pts = int(jnp.sum(loop_pts_mask))
        fuse_bucket = pow2_bucket(n_loop_pts, 4096, self.cfg.max_points)
        loop_pts = jnp.nonzero(
            loop_pts_mask, size=fuse_bucket, fill_value=-1
        )[0].astype(jnp.int32)
        sf = jnp.asarray(self.cfg.scale_factors, jnp.float32)
        for g in group:
            m = local_mapping.fuse_into_keyframe(state, loop_pts, g, self.cam, sf)
            state = local_mapping.apply_fusion(state, g, loop_pts, m.idx)
        state = map_ops.update_point_stats(state, self.cfg)
        # Loop fusion changed the group's observation rows: refresh their
        # covisibility (reference CorrectLoop ends with UpdateConnections
        # over the group, src/LoopClosing.cc:604-615).
        state = map_ops.refresh_covis_rows(
            state, jnp.asarray(sorted(group), jnp.int32)
        )

        # --- Essential graph (reference Optimizer.cc:927-1189) ---
        state = self._optimize_essential_graph(
            state, kf_slot, cand, S_cm, kf_order, covis, pose_before
        )
        # Global BA is NOT run here: finish_detect requests it and the
        # engine schedules dispatch/finish as separate background units
        # (reference spawns it on a 4th thread, src/LoopClosing.cc:631).
        return state

    # ------------------------------------------------------------------
    def _optimize_essential_graph(self, state, kf_slot, cand, S_cm,
                                  kf_order, covis_pre, pose_before):
        K = self.cfg.max_keyframes
        valid = np.asarray(state.kf_valid)
        # Vertices initialize at CURRENT (post-propagation) poses; edge
        # measurements come from the PRE-correction snapshot.
        Rs = state.kf_pose[:, :3, :3]
        ts = state.kf_pose[:, :3, 3]
        ss = jnp.ones((K,), jnp.float32)
        Rm = pose_before[:, :3, :3]
        tm = pose_before[:, :3, 3]
        sm = jnp.ones((K,), jnp.float32)

        edges_i, edges_j = [], []
        # Covisibility edges (weight >= 100) + odometry chain + loop edge.
        pairs = set()
        for a_idx in range(len(kf_order) - 1):
            a, b = kf_order[a_idx], kf_order[a_idx + 1]
            if valid[a] and valid[b]:
                pairs.add((min(a, b), max(a, b)))
        strong = np.argwhere(covis_pre >= COVIS_EDGE_MIN_WEIGHT)
        for a, b in strong:
            if a < b and valid[a] and valid[b]:
                pairs.add((int(a), int(b)))
        # Past loop edges (reference mspLoopEdges re-added every solve,
        # src/Optimizer.cc:1040-1056): their keyframes are mutually
        # consistent now, so the pre-correction snapshot IS the constraint
        # measurement — exactly how the reference measures them from
        # current poses.
        for a, b in self.loop_edges:
            if valid[a] and valid[b]:
                pairs.add((min(a, b), max(a, b)))
        pairs.add((min(kf_slot, cand), max(kf_slot, cand)))
        edges = sorted(pairs)
        ei = jnp.asarray([a for a, _ in edges], jnp.int32)
        ej = jnp.asarray([b for _, b in edges], jnp.int32)

        # Measurements: relative Sim3 from the PRE-correction poses
        # (NonCorrectedSim3, reference :1010-1036); the loop edge uses the
        # solver result instead.
        Si = (Rm[ei], tm[ei], sm[ei])
        Sj = (Rm[ej], tm[ej], sm[ej])
        mR, mt, ms = pose_graph.relative_sim3(Si, Sj)
        # Loop edge measurement: S_{cand<-current}... our S_cm maps cand
        # frame to current frame: S_cm = S_cw ∘ S_mw^{-1} => relative
        # (i=cand, j=current) S_ji = S_cm when i=cand... find its position.
        loop_pos = edges.index((min(kf_slot, cand), max(kf_slot, cand)))
        if edges[loop_pos][0] == cand:
            S_loop = S_cm  # i=cand, j=current: S_ji = S_jw S_iw^-1 = S_cm
        else:
            S_loop = sim3.inverse(S_cm)
        mR = mR.at[loop_pos].set(S_loop[0])
        mt = mt.at[loop_pos].set(S_loop[1])
        ms = ms.at[loop_pos].set(S_loop[2])

        fixed = jnp.zeros((K,), bool).at[cand].set(True)
        problem = pose_graph.PoseGraphProblem(
            vert_R=Rs, vert_t=ts, vert_s=ss,
            vert_fixed=fixed | ~state.kf_valid,
            edge_i=ei, edge_j=ej,
            meas_R=mR, meas_t=mt, meas_s=ms,
            edge_valid=jnp.ones((len(edges),), bool),
        )
        R_opt, t_opt, s_opt = pose_graph.optimize_pose_graph(
            problem, gn_iters=15, cg_iters=30
        )

        # Correct map points through their reference keyframe's old/new
        # pose pair (reference Optimizer.cc:1145-1183).
        old_pose = state.kf_pose
        ref = jnp.clip(state.mp_ref_kf, 0)
        S_old_R = old_pose[:, :3, :3][ref]
        S_old_t = old_pose[:, :3, 3][ref]
        S_old_s = jnp.ones_like(state.mp_xyz[:, 0])
        p_cam = sim3.transform((S_old_R, S_old_t, S_old_s), state.mp_xyz)
        S_new = (R_opt[ref], t_opt[ref], s_opt[ref])
        p_new = sim3.transform(sim3.inverse(S_new), p_cam)
        new_xyz = jnp.where(state.mp_valid[:, None], p_new, state.mp_xyz)

        new_pose = jax.vmap(lambda R, t, s: sim3.to_se3((R, t, s)))(
            R_opt, t_opt, s_opt
        )
        kf_pose = jnp.where(state.kf_valid[:, None, None], new_pose, state.kf_pose)
        return state._replace(kf_pose=kf_pose, mp_xyz=new_xyz)

    # ------------------------------------------------------------------
    # Chunked GBA budget: GBA_TOTAL_ITERS LM iterations total (reference
    # RunGlobalBundleAdjustment budget, src/LoopClosing.cc:708), pumped
    # GBA_CHUNK_ITERS at a time so a superseding loop aborts between
    # chunks and tracked frames interleave.
    GBA_TOTAL_ITERS = 10
    GBA_CHUNK_ITERS = 3

    def _solve_chunk(self, problem, lm_iters):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import distributed_bundle_adjust

            result = distributed_bundle_adjust(
                problem, self.cam, self.mesh, lm_iters=lm_iters, cg_iters=20
            )
            # Mesh outputs -> the map's home device so the scatter jit
            # sees colocated arguments. Two hops because the mesh may
            # span PROCESSES: (1) reshard every leaf to fully-replicated
            # (a global-to-global collective, legal cross-process where a
            # direct device_put to one local device is not), (2) pull the
            # now-fully-addressable value to host and re-commit locally.
            rep = NamedSharding(self.mesh, P())
            result = jax.tree.map(lambda x: jax.device_put(x, rep), result)
            return jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x)), result
            )
        return ba.bundle_adjust(
            problem, self.cam, lm_iters=lm_iters, cg_iters=20
        )

    def dispatch_global_ba(self, state: MapState, kf_order,
                           kf_gen=None, mp_valid_host=None):
        """Start the full-map BA (reference RunGlobalBundleAdjustment via
        the GBA thread, first KF fixed, src/LoopClosing.cc:700-807)
        WITHOUT blocking: the FIRST chunk of LM iterations is dispatched
        and returned as device futures inside a GBAPending;
        continue_global_ba pumps the remaining chunks. With a mesh
        configured each chunk is observation-sharded across it — XLA
        lowers the segment-sums/CG dots to psum over ICI
        (parallel/dist_ba.py); the single-GPU reference's counterpart is
        shelling out to the CUDA pba_driver (src/Optimizer.cc:61-73).

        kf_gen / mp_valid_host snapshots let finish_global_ba recognize
        slots recycled while the solve was in flight."""
        # Compact the camera set to the LIVE keyframes (padded to a
        # power-of-two bucket so recompiles amortize): the previous
        # full-capacity gather built K*N edges regardless of occupancy —
        # 2x waste at default capacity, 4-8x on sparse grown maps.
        C = max(8, 1 << max(0, len(kf_order) - 1).bit_length())
        cam_arr = np.full(C, -1, np.int32)
        cam_arr[: len(kf_order)] = kf_order
        problem, cam_slots, pt_slots = gather_global_ba_problem(
            state, jnp.asarray(cam_arr), kf_order[0],
            1.0 / jnp.asarray(self.cfg.level_sigma2),
        )
        chunk = min(self.GBA_CHUNK_ITERS, self.GBA_TOTAL_ITERS)
        result = self._solve_chunk(problem, chunk)
        return GBAPending(
            idx=self.gba_idx,
            result=result,
            kfs=list(kf_order),
            problem=problem,
            iters_done=chunk,
            cam_slots=cam_arr,
            kf_gen_snap=(np.asarray(kf_gen).copy()
                         if kf_gen is not None else None),
            pt_snap=(np.asarray(mp_valid_host).copy()
                     if mp_valid_host is not None else None),
        )

    def continue_global_ba(self, pending: "GBAPending") -> bool:
        """Pump one more LM chunk of an in-flight GBA; returns True when
        the solve is complete (or aborted) and finish_global_ba may run.

        Abort point: a superseding loop bumped gba_idx while this solve
        was parked — the remaining chunks are skipped outright, the
        reference's mbStopGBA check between LM iterations
        (src/LoopClosing.cc:455-470 + g2o setForceStopFlag)."""
        if pending.idx != self.gba_idx:
            return True  # superseded: stop solving; finish will discard
        remaining = self.GBA_TOTAL_ITERS - pending.iters_done
        if remaining <= 0:
            return True
        chunk = min(self.GBA_CHUNK_ITERS, remaining)
        # Warm-start the next chunk from the previous chunk's iterate.
        r = pending.result
        pending.problem = pending.problem._replace(
            cam_pose=r.cam_pose, xyz=r.xyz
        )
        pending.result = self._solve_chunk(pending.problem, chunk)
        pending.iters_done += chunk
        return pending.iters_done >= self.GBA_TOTAL_ITERS

    def finish_global_ba(self, state: MapState, pending: "GBAPending",
                         kf_order, kf_gen=None, mp_valid_host=None):
        """Apply a finished global BA — unless superseded — and propagate
        the correction to keyframes/points created while it ran (the
        reference's spanning-tree catch-up, src/LoopClosing.cc:734-795).

        Keyframes in the solve whose slot generation is unchanged take
        their GBA pose directly. Keyframes created afterwards chain off
        their predecessor in insertion order: T_corr = T_cur @
        T_parent_cur^-1 @ T_parent_corr (the engine's spanning tree IS
        the temporal chain). Points from the solve take their optimized
        positions; newer points re-anchor through their reference
        keyframe's (old, corrected) pose pair (reference :771-795)."""
        if pending.idx != self.gba_idx:
            return state  # superseded by a newer loop (mnFullBAIdx)
        K = state.kf_valid.shape[0]
        P = state.mp_valid.shape[0]
        live = [s for s in kf_order]
        in_solve = set(pending.kfs)
        gen_ok = (
            (lambda s: True) if (kf_gen is None or pending.kf_gen_snap is None)
            else (lambda s: int(kf_gen[s]) == int(pending.kf_gen_snap[s]))
        )
        kf_apply = np.zeros(K, bool)
        chain_child, chain_parent = [], []
        prev = None
        for s in live:
            if s in in_solve and gen_ok(s):
                kf_apply[s] = True
            elif prev is not None:
                chain_child.append(s)
                chain_parent.append(prev)
            prev = s
        if pending.pt_snap is not None and mp_valid_host is not None:
            pt_apply = pending.pt_snap & np.asarray(mp_valid_host)
        else:
            pt_apply = np.ones(P, bool)
        pad = 8
        while pad < len(chain_child):
            pad *= 2
        cc = np.full(pad, -1, np.int32)
        cp = np.full(pad, -1, np.int32)
        cc[: len(chain_child)] = chain_child
        cp[: len(chain_parent)] = chain_parent
        gba_pose_full = _expand_gba_poses(
            state.kf_pose, pending.result.cam_pose,
            jnp.asarray(pending.cam_slots),
        )
        return _apply_gba(
            state, gba_pose_full, pending.result.xyz,
            jnp.asarray(kf_apply), jnp.asarray(pt_apply),
            jnp.asarray(cc), jnp.asarray(cp),
        )


@jax.jit
def _expand_gba_poses(kf_pose_full, cam_pose_c, cam_slots):
    """Scatter compacted GBA camera poses back onto the (K,4,4) slot
    table (slots not in the solve keep their current pose)."""
    # Pads (-1) route to an out-of-bounds sentinel K and are dropped;
    # clip+where could silently discard slot 0's optimized pose when a
    # pad write landed on it (duplicate-index .set, last write wins).
    K = kf_pose_full.shape[0]
    idx = jnp.where(cam_slots >= 0, cam_slots, K)
    return kf_pose_full.at[idx].set(cam_pose_c, mode='drop')


@jax.jit
def gather_global_ba_problem(state: MapState, cam_slots, fixed_slot,
                             level_inv_sigma2):
    """Whole-map BA problem over the LIVE keyframes: `cam_slots` ((C,)
    int32, -1 padded, C a static bucket) lists them; fixed_slot pinned
    for gauge; every valid point included; edge list = the compacted
    (C,N) observation rows."""
    C = cam_slots.shape[0]
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    cam_ok = (cam_slots >= 0)
    safe_cam = jnp.clip(cam_slots, 0)
    cam_ok = cam_ok & state.kf_valid[safe_cam]
    cam_fixed = ~cam_ok | (cam_slots == fixed_slot)
    pt_slots = jnp.arange(P, dtype=jnp.int32)

    rows_mp = state.kf_mp[safe_cam]  # (C,N)
    rows_valid = (
        (rows_mp >= 0) & cam_ok[:, None] & state.kf_feat_valid[safe_cam]
    )
    obs_pt = jnp.where(rows_valid, rows_mp, -1)
    obs_cam = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[:, None], (C, N)
    )
    inv_sig = jnp.asarray(level_inv_sigma2, jnp.float32)
    obs_isig = inv_sig[jnp.clip(state.kf_oct[safe_cam], 0, inv_sig.shape[0] - 1)]

    problem = ba.BAProblem(
        cam_pose=state.kf_pose[safe_cam],
        cam_fixed=cam_fixed,
        xyz=state.mp_xyz,
        pt_valid=state.mp_valid,
        obs_cam=obs_cam.reshape(-1),
        obs_pt=obs_pt.reshape(-1),
        obs_uv=state.kf_uv[safe_cam].reshape(-1, 2),
        obs_ur=jnp.where(rows_valid, state.kf_right[safe_cam], -1.0).reshape(-1),
        obs_inv_sigma2=obs_isig.reshape(-1),
        obs_valid=rows_valid.reshape(-1),
    )
    return problem, cam_slots, pt_slots
