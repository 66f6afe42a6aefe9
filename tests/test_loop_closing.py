"""Loop-closing tests on a constructed drifted map (no rendering).

Builds the classic scenario the reference's CorrectLoop +
OptimizeEssentialGraph handle (src/LoopClosing.cc:441-638,
src/Optimizer.cc:927-1189): a ring of keyframes observing wall points,
where the estimated map accumulates drift and a loop pair (last ring KF ↔
first KF) must pull it back. Rendering/per-frame perception is exercised
by test_end_to_end.py; here the map state is constructed directly so the
Sim3 + pose-graph + global-BA correction chain is tested in isolation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_cuda_tpu.engine.loop_closing import LoopCloser
from orb_slam_cuda_tpu.geometry import se3
from orb_slam_cuda_tpu.geometry.camera import Camera
from orb_slam_cuda_tpu.slam_map import MapConfig, keyframe_db, state as mstate
from orb_slam_cuda_tpu.vocab import build_vocabulary
from orb_slam_cuda_tpu.ops import hamming

CAM = Camera.create(fx=320.0, fy=320.0, cx=200.0, cy=150.0, width=400, height=300)
CFG = MapConfig(max_keyframes=32, max_features=256, max_points=2048, n_levels=4)


def build_drifted_ring(rng, n_kf=16, drift=0.02):
    """True ring of cameras inside a cylinder of wall points; estimated
    (drifted) poses integrate noisy odometry; point positions are
    consistent with the drifted poses of their first observers (as real
    SLAM drift produces)."""
    n_pts_total = 800
    ang = rng.uniform(0, 2 * np.pi, n_pts_total)
    wall_r = 6.0
    pts_true = np.stack(
        [wall_r * np.sin(ang), rng.uniform(-2, 2, n_pts_total), -wall_r * np.cos(ang)],
        axis=-1,
    ).astype(np.float32)
    desc = rng.integers(0, 2**32, (n_pts_total, 8), dtype=np.uint32)
    # Per-point keypoint orientation, consistent across observations (the
    # rotation-consistency histogram rejects matches otherwise).
    pt_angle = rng.uniform(0, 360, n_pts_total).astype(np.float32)

    # True poses: ring, yawing around; camera k looks outward at angle th_k.
    T_true = []
    for k in range(n_kf):
        th = 2 * np.pi * k / n_kf
        Rwc = np.asarray(se3.so3_exp(jnp.asarray(np.array([0, th, 0], np.float32))))
        c = np.array([1.2 * np.sin(th), 0.0, -1.2 * np.cos(th) + 1.2])
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ c
        T_true.append(T)

    # Drifted estimates: integrate noisy relative odometry.
    T_est = [T_true[0]]
    for k in range(1, n_kf):
        rel = T_true[k] @ np.linalg.inv(T_true[k - 1])
        noise = np.asarray(
            se3.exp(jnp.asarray((rng.normal(0, drift, 6)).astype(np.float32)))
        )
        T_est.append(noise @ rel @ T_est[-1])

    vocab = build_vocabulary(
        rng.integers(0, 2**32, (1024, 8), dtype=np.uint32), k=8, depth=2, levelsup_depth=1
    )
    word, node, idf = vocab.transform(hamming.bipolar(jnp.asarray(desc)))
    word_n, node_n, idf_n = np.asarray(word), np.asarray(node), np.asarray(idf)

    # ---- Self-consistent drifted map ----
    # A point's stored position is its TRUE camera-frame coords seen from
    # its first observer, back-projected through that observer's DRIFTED
    # pose (how drift manifests). The two revisit keyframes (n_kf-2,
    # n_kf-1) create FRESH duplicate copies of the start's wall points —
    # the real pre-loop state (copies share descriptors, so BoW matching
    # can link them; loop fusion is what merges them). Every keyframe's
    # keypoints are projections of the copies it observes through its own
    # drifted pose, so the map is internally consistent and only the loop
    # seam carries the accumulated drift.
    st = mstate.empty(CFG)
    db = keyframe_db.empty(CFG.max_keyframes, CFG.max_features)
    N = CFG.max_features
    K_np = np.asarray(CAM.K)
    revisit_from = n_kf - 2

    pt_slot_of = np.full(n_pts_total, -1, np.int64)  # primary copies
    dup_slot_of = np.full(n_pts_total, -1, np.int64)  # revisit copies
    slot_xyz = {}
    slot_src = {}
    slot_first = {}
    next_slot = 0

    def store_point(p, k):
        nonlocal next_slot
        slot = next_slot
        next_slot += 1
        Xc = pts_true[p] @ T_true[k][:3, :3].T + T_true[k][:3, 3]
        Te = T_est[k]
        slot_xyz[slot] = (Xc - Te[:3, 3]) @ Te[:3, :3]
        slot_src[slot] = p
        slot_first[slot] = k
        return slot

    for k in range(n_kf):
        Xc = pts_true @ T_true[k][:3, :3].T + T_true[k][:3, 3]
        uv = (Xc / Xc[:, 2:3]) @ K_np.T
        vis = (
            (Xc[:, 2] > 1.0)
            & (uv[:, 0] >= 10) & (uv[:, 0] < 390)
            & (uv[:, 1] >= 10) & (uv[:, 1] < 290)
        )
        vis_idx = np.flatnonzero(vis)[:N]
        n_v = len(vis_idx)

        mp_row = np.full(N, -1, np.int32)
        uv_row = np.zeros((N, 2), np.float32)
        for i, p in enumerate(vis_idx):
            if k < revisit_from:
                if pt_slot_of[p] < 0:
                    pt_slot_of[p] = store_point(p, k)
                slot = pt_slot_of[p]
            else:
                # Revisit: never reuse copies older than the previous
                # revisit keyframe (the loop is not closed yet).
                if dup_slot_of[p] >= 0:
                    slot = dup_slot_of[p]
                elif pt_slot_of[p] >= 0 and slot_first[pt_slot_of[p]] >= revisit_from - 3:
                    slot = pt_slot_of[p]  # recently-made primary, keep
                else:
                    dup_slot_of[p] = store_point(p, k)
                    slot = dup_slot_of[p]
            mp_row[i] = slot
            # Keypoint = projection of the stored copy through this KF's
            # drifted pose (self-consistent observation).
            Te = T_est[k]
            xc = slot_xyz[slot] @ Te[:3, :3].T + Te[:3, 3]
            uv_row[i] = (K_np @ (xc / xc[2]))[:2]

        desc_row = np.zeros((N, 8), np.uint32)
        desc_row[:n_v] = desc[vis_idx]
        valid_row = np.zeros(N, bool)
        valid_row[:n_v] = True
        word_row = np.full(N, -1, np.int32)
        word_row[:n_v] = word_n[vis_idx]
        node_row = np.full(N, -1, np.int32)
        node_row[:n_v] = node_n[vis_idx]
        idf_row = np.zeros(N, np.float32)
        idf_row[:n_v] = idf_n[vis_idx]
        ang_row = np.zeros(N, np.float32)
        ang_row[:n_v] = pt_angle[vis_idx]

        st = mstate.insert_keyframe(
            st, k, jnp.asarray(T_est[k]), k,
            jnp.asarray(uv_row), jnp.full((N,), -1.0), jnp.full((N,), -1.0),
            jnp.zeros((N,), jnp.int32),
            jnp.asarray(ang_row),
            jnp.asarray(desc_row), jnp.asarray(valid_row),
            jnp.asarray(word_row), jnp.asarray(node_row), jnp.asarray(mp_row),
        )
        wu, wt = keyframe_db.compute_bow_row(
            jnp.asarray(word_row), jnp.asarray(idf_row), jnp.asarray(valid_row)
        )
        db = keyframe_db.insert(db, k, wu, wt)

    slots = np.array(sorted(slot_xyz), np.int32)
    xyz = np.stack([slot_xyz[s] for s in slots]).astype(np.float32)
    dsc = np.stack([desc[slot_src[s]] for s in slots])
    first = np.array([slot_first[s] for s in slots], np.int32)
    st = mstate.add_points(
        st,
        jnp.asarray(slots),
        jnp.asarray(xyz),
        jnp.ones((len(slots),), bool),
        jnp.asarray(dsc),
        jnp.zeros((len(slots), 3), jnp.float32),
        jnp.zeros((len(slots),), jnp.float32),
        jnp.full((len(slots),), 1e9, jnp.float32),
        jnp.asarray(first),
        jnp.asarray(first),
    )
    from orb_slam_cuda_tpu.slam_map import ops as map_ops

    st = map_ops.update_point_stats(st, CFG)
    # Seed the incremental covisibility (the engine refreshes it at
    # keyframe events; hand-built fixtures must do it once).
    st = st._replace(covis=map_ops.covisibility_matrix(st))
    return st, db, T_true, T_est, vocab


class TestLoopClosing:
    def test_compute_sim3_finds_loop_pair(self, rng):
        st, db, T_true, T_est, vocab = build_drifted_ring(rng)
        lc = LoopCloser(CFG, CAM, vocab)
        hit = lc._compute_sim3(st, 15, [0])
        assert hit is not None
        cand, S_cm, inl = hit
        assert cand == 0
        # Expected S_cm maps cand(0) cam frame -> current(15) cam frame.
        # In true geometry that is T15_true ∘ T0_true^{-1} (scale ~1 up to
        # drift-induced scale).
        rel_true = T_true[15] @ np.linalg.inv(T_true[0])
        R, t, s = [np.asarray(v) for v in S_cm]
        np.testing.assert_allclose(R, rel_true[:3, :3], atol=0.1)
        assert abs(float(s) - 1.0) < 0.15

    def test_correct_loop_reduces_drift(self, rng):
        # Global BA is disabled here: the fixture's keypoints are
        # synthesized FROM the drifted map (self-consistent by
        # construction), so BA's optimum is the drifted shape — on real
        # observations GBA polishes, on this fixture it would faithfully
        # restore the drift. The Sim3-propagation + essential-graph chain
        # is what this test isolates; BA convergence is covered by
        # test_bundle_adjust.py.
        st, db, T_true, T_est, vocab = build_drifted_ring(rng, drift=0.025)
        lc = LoopCloser(CFG, CAM, vocab, run_global_ba=False)
        kf_order = list(range(16))

        # Drift before: pose error of the last keyframes vs truth.
        def max_err(state):
            errs = []
            for k in range(16):
                d = np.asarray(state.kf_pose[k]) @ np.linalg.inv(T_true[k])
                errs.append(np.abs(np.asarray(se3.log(jnp.asarray(d)))).max())
            return np.asarray(errs)

        before = max_err(st)
        hit = lc._compute_sim3(st, 15, [0])
        assert hit is not None
        cand, S_cm, _ = hit
        st2 = lc._correct_loop(st, 15, cand, S_cm, kf_order)
        after = max_err(st2)
        # The loop end (KFs 12-15) must improve substantially.
        assert after[12:].max() < 0.5 * before[12:].max(), (
            f"before {before[12:].max():.4f} after {after[12:].max():.4f}"
        )
        # And the whole ring should not get worse on average.
        assert after.mean() < before.mean()

    def test_sim3_funnel_rejects_aliased_candidate(self, rng):
        # A geometrically-wrong candidate (keyframe on the far side of
        # the ring — some shared BoW words, no consistent Sim3) must be
        # rejected by the RANSAC -> SearchBySim3/OptimizeSim3 ->
        # projection-gate ladder (reference LoopClosing.cc:267-440
        # returns false).
        st, db, T_true, T_est, vocab = build_drifted_ring(rng)
        lc = LoopCloser(CFG, CAM, vocab)
        assert lc._compute_sim3(st, 15, [7]) is None
        assert lc._compute_sim3(st, 15, [8]) is None

    def test_global_ba_distributed_matches_single(self, rng):
        # Engine-level wiring of parallel/dist_ba.py: the loop closer's
        # global BA sharded over the 8-device CPU mesh must land on the
        # same optimum as the single-device solve.
        from orb_slam_cuda_tpu.parallel import make_mesh

        st, db, T_true, T_est, vocab = build_drifted_ring(rng)
        kf_order = list(range(16))

        def run_full(lc):
            pending = lc.dispatch_global_ba(st, kf_order)
            while not lc.continue_global_ba(pending):
                pass
            return lc.finish_global_ba(st, pending, kf_order)

        st_single = run_full(LoopCloser(CFG, CAM, vocab))
        st_mesh = run_full(LoopCloser(CFG, CAM, vocab, mesh=make_mesh(8)))
        np.testing.assert_allclose(
            np.asarray(st_mesh.kf_pose), np.asarray(st_single.kf_pose),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(st_mesh.mp_xyz), np.asarray(st_single.mp_xyz),
            atol=5e-3,
        )

    def test_gba_chunked_abort_mid_solve(self, rng):
        """A superseding loop mid-GBA must abort the remaining LM chunks
        AND make finish a no-op (reference mbStopGBA + mnFullBAIdx,
        src/LoopClosing.cc:455-470,716-717). Before chunking, the
        10-iteration dispatch was uninterruptible and only the finished
        result could be discarded."""
        st, db, T_true, T_est, vocab = build_drifted_ring(rng)
        kf_order = list(range(16))
        lc = LoopCloser(CFG, CAM, vocab)
        pending = lc.dispatch_global_ba(st, kf_order)
        assert pending.iters_done == lc.GBA_CHUNK_ITERS < lc.GBA_TOTAL_ITERS
        # A second loop closes while the solve is parked: gba_idx bumps.
        lc.gba_idx += 1
        assert lc.continue_global_ba(pending) is True  # aborted, no chunk run
        assert pending.iters_done == lc.GBA_CHUNK_ITERS  # nothing solved
        st_after = lc.finish_global_ba(st, pending, kf_order)
        assert st_after is st  # superseded result discarded outright

        # Un-superseded solves pump chunk by chunk to the full budget.
        lc2 = LoopCloser(CFG, CAM, vocab)
        p2 = lc2.dispatch_global_ba(st, kf_order)
        pumps = 0
        while not lc2.continue_global_ba(p2):
            pumps += 1
        assert p2.iters_done == lc2.GBA_TOTAL_ITERS
        assert pumps >= 1

    def test_detect_consistency_chaining(self, rng):
        st, db, T_true, T_est, vocab = build_drifted_ring(rng)
        lc = LoopCloser(CFG, CAM, vocab)
        # First detections accumulate consistency; only after
        # CONSISTENCY_TH consecutive hits does a candidate qualify.
        out1 = lc._detect(st, db, 13)
        out2 = lc._detect(st, db, 14)
        out3 = lc._detect(st, db, 15)
        out4 = lc._detect(st, db, 15)
        outs = [out1, out2, out3, out4]
        # The first call can never qualify a candidate.
        assert out1 == []
        # By the 4th consecutive consistent detection something qualifies
        # (the ring's closing keyframes genuinely see the start's walls).
        assert any(len(o) > 0 for o in outs[2:])


class TestRelocalizationGate:
    """The 50-inlier acceptance rule (reference src/Tracking.cc:1585):
    relocalization must REJECT candidates whose refined pose holds fewer
    than 50 inliers instead of returning a tentative success."""

    def _frame_from_keyframe(self, st, vocab, k, keep: int):
        from orb_slam_cuda_tpu.engine.frame import FrameData

        N = st.kf_mp.shape[1]
        valid = np.asarray(st.kf_feat_valid[k]).copy()
        idx = np.flatnonzero(valid)
        valid[:] = False
        valid[idx[:keep]] = True
        desc = st.kf_desc[k]
        return FrameData(
            uv=st.kf_uv[k], uv_raw=st.kf_uv[k], oct=st.kf_oct[k],
            ang=st.kf_ang[k],
            response=jnp.zeros((N,), jnp.float32), desc=desc,
            bip=hamming.bipolar(desc), valid=jnp.asarray(valid),
            word=st.kf_word[k], node=st.kf_node[k],
            idf=jnp.ones((N,), jnp.float32),
            right=jnp.full((N,), -1.0), depth=jnp.full((N,), -1.0),
            mp=jnp.full((N,), -1, jnp.int32),
        )

    def test_accepts_strong_rejects_weak(self, rng):
        from orb_slam_cuda_tpu.engine import relocalization
        from orb_slam_cuda_tpu.slam_map import keyframe_db as kdb

        st, db, T_true, T_est, vocab = build_drifted_ring(rng)
        sf = jnp.asarray(CFG.scale_factors, jnp.float32)

        # Full feature set relocalizes.
        frame = self._frame_from_keyframe(st, vocab, 5, keep=250)
        pose, mp, ok = relocalization.relocalize(
            st, db, frame, CAM, vocab.n_words, sf
        )
        assert ok
        err = np.abs(np.asarray(pose) - np.asarray(st.kf_pose[5])).max()
        assert err < 0.05

        # Starved feature set (< 50 possible inliers) must be rejected.
        frame_weak = self._frame_from_keyframe(st, vocab, 5, keep=40)
        _, _, ok_weak = relocalization.relocalize(
            st, db, frame_weak, CAM, vocab.n_words, sf
        )
        assert not ok_weak


class TestProjectionGateNoCap:
    """Round-5 regression: the loop-group projection gate must see EVERY
    group point (reference iterates all of them, src/LoopClosing.cc:462-476)
    — the old fixed 4096 cap silently dropped high-slot points on grown
    maps."""

    def test_group_points_beyond_4096_are_seen(self, rng):
        from orb_slam_cuda_tpu.engine import loop_closing as lc_mod
        from orb_slam_cuda_tpu.slam_map import ops as map_ops

        cfg = MapConfig(max_keyframes=32, max_features=512,
                        max_points=8192, n_levels=4)
        N = cfg.max_features
        K_np = np.asarray(CAM.K)
        st = mstate.empty(cfg)

        def rand_points(n, seed):
            r = np.random.default_rng(seed)
            u = r.uniform(30, 370, n)
            v = r.uniform(30, 270, n)
            z = r.uniform(4.0, 8.0, n)
            x = (u - K_np[0, 2]) * z / K_np[0, 0]
            y = (v - K_np[1, 2]) * z / K_np[1, 1]
            return np.stack([x, y, z], -1).astype(np.float32)

        n_shared = 15           # covis weight per neighbor (>=15 gate)
        n_unique = 165
        n_neighbors = 25
        cand = 0
        total_pts = N + n_neighbors * n_unique  # 512 + 4125 = 4637 > 4096
        xyz = rand_points(total_pts, 7)
        desc = rng.integers(0, 2**32, (total_pts, 8), dtype=np.uint32)

        def insert(slot, mp_row_ids):
            mp_row = np.full(N, -1, np.int32)
            uv_row = np.zeros((N, 2), np.float32)
            valid = np.zeros(N, bool)
            d_row = np.zeros((N, 8), np.uint32)
            for i, p in enumerate(mp_row_ids):
                mp_row[i] = p
                pr = K_np @ (xyz[p] / xyz[p][2])
                uv_row[i] = pr[:2]
                valid[i] = True
                d_row[i] = desc[p]
            return mstate.insert_keyframe(
                st2, slot, jnp.eye(4), slot,
                jnp.asarray(uv_row), jnp.full((N,), -1.0),
                jnp.full((N,), -1.0), jnp.zeros((N,), jnp.int32),
                jnp.zeros((N,), jnp.float32), jnp.asarray(d_row),
                jnp.asarray(valid), jnp.full((N,), -1, jnp.int32),
                jnp.full((N,), -1, jnp.int32), jnp.asarray(mp_row),
            )

        st2 = st
        st2 = insert(cand, list(range(N)))  # cand observes pts 0..511
        for j in range(n_neighbors):
            shared = list(range(j * n_shared, (j + 1) * n_shared))
            unique = list(range(N + j * n_unique, N + (j + 1) * n_unique))
            st2 = insert(1 + j, shared + unique)

        slots = np.arange(total_pts, dtype=np.int32)
        st2 = mstate.add_points(
            st2, jnp.asarray(slots), jnp.asarray(xyz),
            jnp.ones((total_pts,), bool), jnp.asarray(desc),
            jnp.zeros((total_pts, 3), jnp.float32),
            jnp.zeros((total_pts,), jnp.float32),
            jnp.full((total_pts,), 100.0, jnp.float32),
            jnp.zeros((total_pts,), jnp.int32),
            jnp.zeros((total_pts,), jnp.int32),
        )
        st2 = map_ops.update_point_stats(st2, cfg)
        st2 = st2._replace(covis=map_ops.covisibility_matrix(st2))

        n_grp, loop_kfs = lc_mod.loop_group_point_count(st2, np.int32(cand))
        assert int(n_grp) == total_pts
        bucket = lc_mod.pow2_bucket(int(n_grp), 4096, cfg.max_points)
        assert bucket == 8192

        # Current KF: 50 features matching the HIGHEST-slot points only.
        hi = list(range(total_pts - 50, total_pts))
        kf_cur = 31
        mp_save = st2
        st2 = insert(kf_cur, hi)
        # kf_cur must have NO map bindings (it is the querying side).
        kf_mp = np.asarray(st2.kf_mp).copy()
        kf_mp[kf_cur, :] = -1
        st2 = st2._replace(kf_mp=jnp.asarray(kf_mp))

        sf = jnp.asarray(cfg.scale_factors, jnp.float32)
        feat_matched = jnp.full((N,), -1, jnp.int32)
        R = jnp.eye(3); t = jnp.zeros(3); s = jnp.float32(1.0)

        n_total, point_match = lc_mod.loop_points_projection_gate(
            st2, np.int32(kf_cur), np.int32(cand), R, t, s,
            feat_matched, CAM, sf, loop_kfs, n_pts_bucket=bucket,
        )
        pm = np.asarray(point_match)
        assert int(n_total) >= 40
        assert (pm >= 4096).any(), "high-slot group points were truncated"

        # Contrast: the old fixed cap misses every high-slot point.
        n_capped, _ = lc_mod.loop_points_projection_gate(
            st2, np.int32(kf_cur), np.int32(cand), R, t, s,
            feat_matched, CAM, sf, loop_kfs, n_pts_bucket=4096,
        )
        assert int(n_capped) < int(n_total)
