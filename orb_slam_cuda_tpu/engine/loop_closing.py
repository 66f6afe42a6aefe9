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
from ..solvers import pose_graph, sim3_solver
from . import local_mapping

CONSISTENCY_TH = 3  # reference mnCovisibilityConsistencyTh (LoopClosing.cc:43)
MIN_SIM3_INLIERS = 20  # reference :383
COVIS_EDGE_MIN_WEIGHT = 100  # reference Optimizer.cc:1090


@functools.partial(jax.jit, static_argnames=("n_words",))
def _bow_scores_vs_neighbors(db, state: MapState, kf_slot, n_words):
    """Min BoW score between the keyframe and its covisibility neighbors
    (the loop-candidate floor, reference LoopClosing.cc:146-165)."""
    q = keyframe_db.dense_bow(db.word[kf_slot], db.weight[kf_slot], n_words)
    s = keyframe_db.scores(db, q)
    covis = map_ops.covisibility_matrix(state)
    neigh = (covis[kf_slot] >= 15) & db.valid
    min_score = jnp.min(jnp.where(neigh, s, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 1.0)
    return q, s, covis, neigh, min_score


class LoopCloser:
    def __init__(self, cfg: MapConfig, cam: Camera, vocab, fix_scale: bool = False,
                 run_global_ba: bool = True):
        self.cfg = cfg
        self.cam = cam
        self.vocab = vocab
        self.fix_scale = fix_scale
        self.run_global_ba = run_global_ba
        self.consistent_groups: List[Tuple[set, int]] = []
        self.last_loop_kf_order: int = 0
        self.n_loops_closed = 0

    # ------------------------------------------------------------------
    def process(self, state: MapState, db, kf_slot: int, kf_order: List[int]):
        """DetectLoop → ComputeSim3 → CorrectLoop for one new keyframe."""
        if len(kf_order) < 10:  # reference: map <10 KFs -> skip (:131)
            return state, db

        # Recent-loop cooldown (reference: mLastLoopKFid+10, :133).
        if len(kf_order) - self.last_loop_kf_order < 10:
            return state, db

        cands = self._detect(state, db, kf_slot)
        if not cands:
            return state, db

        hit = self._compute_sim3(state, kf_slot, cands)
        if hit is None:
            return state, db
        cand_kf, S_cm, inlier_pairs = hit

        state = self._correct_loop(state, kf_slot, cand_kf, S_cm, kf_order)
        self.last_loop_kf_order = len(kf_order)
        self.n_loops_closed += 1
        self.consistent_groups = []
        return state, db

    # ------------------------------------------------------------------
    def _detect(self, state: MapState, db, kf_slot: int) -> List[int]:
        """DetectLoop (reference :122-265): BoW candidates above the
        neighbor-score floor, then covisibility-consistency chaining over
        successive keyframes (a candidate group must recur in
        CONSISTENCY_TH consecutive detections)."""
        q, s, covis, neigh, min_score = _bow_scores_vs_neighbors(
            db, state, kf_slot, self.vocab.n_words
        )
        exclude = jnp.zeros_like(db.valid).at[kf_slot].set(True) | neigh
        cand_mask, _ = keyframe_db.detect_candidates(
            db, q, exclude, covis, min_score=min_score
        )
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
            if bool(ok):
                S_cm = (res.R, res.t, res.s)  # cand-frame -> current-frame
                return cand, S_cm, inl
        return None

    # ------------------------------------------------------------------
    def _correct_loop(self, state: MapState, kf_slot: int, cand: int,
                      S_cm, kf_order: List[int]) -> MapState:
        """CorrectLoop (reference :441-638) + essential-graph optimization
        (src/Optimizer.cc:927-1189) + global BA (:48-93)."""
        K = self.cfg.max_keyframes
        covis = np.asarray(map_ops.covisibility_matrix(state))
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
        loop_pts = jnp.nonzero(
            loop_pts_mask, size=min(4096, self.cfg.max_points), fill_value=-1
        )[0].astype(jnp.int32)
        sf = jnp.asarray(self.cfg.scale_factors, jnp.float32)
        for g in group:
            m = local_mapping.fuse_into_keyframe(state, loop_pts, g, self.cam, sf)
            state = local_mapping.apply_fusion(state, g, loop_pts, m.idx)
        state = map_ops.update_point_stats(state, self.cfg)

        # --- Essential graph (reference Optimizer.cc:927-1189) ---
        state = self._optimize_essential_graph(
            state, kf_slot, cand, S_cm, kf_order, covis, pose_before
        )

        # --- Global BA (reference RunGlobalBundleAdjustment, 10 iters) ---
        if self.run_global_ba:
            state = self._global_ba(state, kf_order)
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
    def _global_ba(self, state: MapState, kf_order):
        """Full-map BA (reference GlobalBundleAdjustemnt via the GBA
        thread, 10 LM iterations, first KF fixed)."""
        problem, cam_slots, pt_slots = gather_global_ba_problem(
            state, kf_order[0], 1.0 / jnp.asarray(self.cfg.level_sigma2),
        )
        result = ba.bundle_adjust(problem, self.cam, lm_iters=10, cg_iters=20)
        return local_mapping.scatter_ba_result(
            state, result, problem, cam_slots, pt_slots
        )


@jax.jit
def gather_global_ba_problem(state: MapState, fixed_slot, level_inv_sigma2):
    """Whole-map BA problem: every valid keyframe is a camera (fixed_slot
    pinned for gauge), every valid point included, edge list = the full
    (K,N) observation table."""
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    cam_slots = jnp.arange(K, dtype=jnp.int32)
    cam_fixed = ~state.kf_valid | (cam_slots == fixed_slot)
    pt_slots = jnp.arange(P, dtype=jnp.int32)

    rows_valid = (state.kf_mp >= 0) & state.kf_valid[:, None] & state.kf_feat_valid
    obs_pt = jnp.where(rows_valid, state.kf_mp, -1)
    obs_cam = jnp.broadcast_to(cam_slots[:, None], (K, N))
    inv_sig = jnp.asarray(level_inv_sigma2, jnp.float32)
    obs_isig = inv_sig[jnp.clip(state.kf_oct, 0, inv_sig.shape[0] - 1)]

    problem = ba.BAProblem(
        cam_pose=state.kf_pose,
        cam_fixed=cam_fixed,
        xyz=state.mp_xyz,
        pt_valid=state.mp_valid,
        obs_cam=obs_cam.reshape(-1),
        obs_pt=obs_pt.reshape(-1),
        obs_uv=state.kf_uv.reshape(-1, 2),
        obs_ur=jnp.where(rows_valid, state.kf_right, -1.0).reshape(-1),
        obs_inv_sigma2=obs_isig.reshape(-1),
        obs_valid=rows_valid.reshape(-1),
    )
    return problem, cam_slots, pt_slots
