"""Tests for the map PyTree: observations, covisibility, point stats,
culling, and the BoW keyframe database."""

import jax.numpy as jnp
import numpy as np

from orb_slam_cuda_tpu.slam_map import MapConfig, keyframe_db, ops, state as mstate

CFG = MapConfig(max_keyframes=8, max_features=32, max_points=64, n_levels=4)


def small_map(rng, n_kf=4, pts_per_kf=8):
    """Build a toy map: each KF observes a sliding window of points so
    neighbors share points."""
    st = mstate.empty(CFG)
    P = CFG.max_points
    for k in range(n_kf):
        mp = np.full(CFG.max_features, -1, np.int32)
        # KF k observes points [4k, 4k+pts_per_kf)
        for i in range(pts_per_kf):
            mp[i] = 4 * k + i
        uv = rng.uniform(0, 100, (CFG.max_features, 2)).astype(np.float32)
        desc = rng.integers(0, 2**32, (CFG.max_features, 8), dtype=np.uint32)
        st = mstate.insert_keyframe(
            st, k, jnp.eye(4), k,
            jnp.asarray(uv), jnp.full((CFG.max_features,), -1.0),
            jnp.full((CFG.max_features,), -1.0),
            jnp.zeros((CFG.max_features,), jnp.int32),
            jnp.zeros((CFG.max_features,), jnp.float32),
            jnp.asarray(desc),
            jnp.ones((CFG.max_features,), bool),
            jnp.zeros((CFG.max_features,), jnp.int32),
            jnp.zeros((CFG.max_features,), jnp.int32),
            jnp.asarray(mp),
        )
    used = sorted({4 * k + i for k in range(n_kf) for i in range(pts_per_kf)})
    slots = jnp.asarray(np.array(used, np.int32))
    valid = jnp.ones((len(used),), bool)
    st = mstate.add_points(
        st, slots,
        jnp.asarray(rng.normal(0, 1, (len(used), 3)).astype(np.float32)),
        valid,
        jnp.asarray(rng.integers(0, 2**32, (len(used), 8), dtype=np.uint32)),
        jnp.zeros((len(used), 3), jnp.float32),
        jnp.zeros((len(used),), jnp.float32),
        jnp.full((len(used),), 100.0, jnp.float32),
        jnp.zeros((len(used),), jnp.int32),
        jnp.zeros((len(used),), jnp.int32),
    )
    return st


class TestObservations:
    def test_counts(self, rng):
        st = small_map(rng)
        counts = np.asarray(ops.observation_counts(st))
        # Point 4 is observed by KF 0 (slot 4) and KF 1 (slot 0).
        assert counts[4] == 2
        assert counts[0] == 1  # only KF 0
        assert counts[12] == 2  # KFs 2,3

    def test_covisibility_matrix(self, rng):
        st = small_map(rng)
        W = np.asarray(ops.covisibility_matrix(st))
        assert W[0, 0] == 0
        assert W[0, 1] == 4  # share points 4..7
        assert W[0, 2] == 0  # no overlap (0..7 vs 8..15)
        assert (W == W.T).all()

    def test_refresh_covis_rows_matches_full_recompute(self, rng):
        """Regression (round-5 advisor findings): -1 pads in kf_ids must
        not touch slot 0 (or any slot), and unbound features (kf_mp=-1,
        clipped to 0) must not erase genuine observations of POINT 0."""
        st = small_map(rng)
        # Make point 0 shared: bind it into KF 1 too (KF1 slot 30 free).
        kf_mp = np.asarray(st.kf_mp).copy()
        kf_mp[1, 30] = 0
        st = st._replace(kf_mp=jnp.asarray(kf_mp))
        W_true = np.asarray(ops.covisibility_matrix(st))
        assert W_true[0, 1] == 5  # points 4..7 plus point 0

        # Refresh every row through a -1-PADDED id list (the
        # local_mapping call shape) starting from a corrupted matrix.
        bogus = jnp.full_like(st.covis, 77)
        st_b = st._replace(covis=bogus)
        ids = jnp.asarray(np.array([0, 1, 2, 3, -1, -1, -1], np.int32))
        st_r = ops.refresh_covis_rows(st_b, ids)
        W = np.asarray(st_r.covis)
        K = len(W)
        valid = np.asarray(st.kf_valid)
        # Rows/cols of refreshed VALID kfs must equal the full recompute.
        np.testing.assert_array_equal(W[:4][:, :4], W_true[:4][:, :4])
        assert W[0, 1] == 5 and W[1, 0] == 5
        # Pads must not have resurrected slot-0 staleness anywhere.
        assert (W[:4] != 77).all() and (W[:, :4] != 77).all()

    def test_covis_counts_for_bindings(self, rng):
        st = small_map(rng)
        pts = jnp.asarray(np.array([4, 5, 6, 7, -1], np.int32))
        c = np.asarray(ops.covisibility_counts_for_bindings(st, pts))
        assert c[0] == 4 and c[1] == 4 and c[2] == 0

    def test_points_of_keyframes(self, rng):
        st = small_map(rng)
        mask = jnp.asarray(np.array([True, False, False, False] + [False] * 4))
        sel = np.asarray(ops.points_of_keyframes(st, mask))
        assert sel[:8].all() and not sel[8:].any()

    def test_erase_point_unbinds(self, rng):
        st = small_map(rng)
        P = CFG.max_points
        mask = np.zeros(P, bool)
        mask[4] = True
        st2 = mstate.erase_points(st, jnp.asarray(mask))
        assert not bool(st2.mp_valid[4])
        assert (np.asarray(st2.kf_mp) != 4).all()

    def test_erase_keyframe(self, rng):
        st = small_map(rng)
        st2 = mstate.erase_keyframe(st, 1)
        assert not bool(st2.kf_valid[1])
        counts = np.asarray(ops.observation_counts(st2))
        assert counts[4] == 1  # KF1's observation gone


class TestPointStats:
    def test_distinctive_descriptor_is_an_observation(self, rng):
        st = small_map(rng)
        st2 = ops.update_point_stats(st, CFG)
        # Point 4 observed by (kf0,slot4) and (kf1,slot0): its descriptor
        # must equal one of those two.
        d = np.asarray(st2.mp_desc[4])
        d1 = np.asarray(st.kf_desc[0, 4])
        d2 = np.asarray(st.kf_desc[1, 0])
        assert (d == d1).all() or (d == d2).all()

    def test_normal_points_from_camera(self, rng):
        st = small_map(rng)
        # All cameras at origin (identity poses): normal = direction to point.
        st2 = ops.update_point_stats(st, CFG)
        xyz = np.asarray(st2.mp_xyz[4])
        n = np.asarray(st2.mp_normal[4])
        expected = xyz / np.linalg.norm(xyz)
        np.testing.assert_allclose(n, expected, atol=1e-5)

    def test_untouched_points_keep_desc(self, rng):
        st = small_map(rng)
        before = np.asarray(st.mp_desc[63])
        st2 = ops.update_point_stats(st, CFG)
        np.testing.assert_array_equal(np.asarray(st2.mp_desc[63]), before)


class TestCulling:
    def test_low_found_ratio_culled(self, rng):
        st = small_map(rng)
        st = st._replace(
            mp_visible=st.mp_visible.at[4].set(10.0),
            mp_found=st.mp_found.at[4].set(1.0),
        )
        P = CFG.max_points
        probation = jnp.ones((P,), bool)
        age = jnp.zeros((P,), jnp.int32)
        mask = np.asarray(ops.cull_points(st, probation, age))
        assert mask[4]

    def test_few_obs_culled_after_age(self, rng):
        st = small_map(rng)
        P = CFG.max_points
        probation = jnp.ones((P,), bool)
        age = jnp.full((P,), 3, jnp.int32)
        mask = np.asarray(ops.cull_points(st, probation, age, th_obs=1))
        # Point 0 observed once and old enough -> culled.
        assert mask[0]
        # Point 4 has 2 observations > th_obs=1 and decent ratio: kept.
        assert not mask[4]

    def test_redundancy(self, rng):
        st = small_map(rng)
        r01 = float(ops.keyframe_redundancy(st, 0))
        assert r01 < 0.9  # sliding-window map: not redundant


class TestBowDB:
    def test_insert_score_roundtrip(self, rng):
        db = keyframe_db.empty(4, 16)
        words = jnp.asarray(np.array([3, 1, 3, 7, -1] + [-1] * 11, np.int32))
        idf = jnp.ones((16,), jnp.float32)
        valid = words >= 0
        wu, wt = keyframe_db.compute_bow_row(words, idf, valid)
        wu_n, wt_n = np.asarray(wu), np.asarray(wt)
        got = {int(w): float(t) for w, t in zip(wu_n, wt_n) if w >= 0}
        assert set(got) == {1, 3, 7}
        np.testing.assert_allclose(got[3], 0.5, atol=1e-6)  # 2 of 4
        db = keyframe_db.insert(db, 0, wu, wt)
        q = keyframe_db.dense_bow(wu, wt, 32)
        s = np.asarray(keyframe_db.scores(db, q))
        np.testing.assert_allclose(s[0], 1.0, atol=1e-6)  # self-similarity
        assert s[1] == 0.0

    def test_common_words_and_candidates(self, rng):
        db = keyframe_db.empty(8, 8)
        idf = jnp.ones((8,), jnp.float32)
        rows = [
            [0, 1, 2, 3],  # kf0: similar to query
            [0, 1, 2, 4],  # kf1: similar
            [5, 6, 7, -1],  # kf2: dissimilar
        ]
        for i, r in enumerate(rows):
            w = jnp.asarray(np.array(r + [-1] * (8 - len(r)), np.int32))
            wu, wt = keyframe_db.compute_bow_row(w, idf, w >= 0)
            db = keyframe_db.insert(db, i, wu, wt)
        qw = jnp.asarray(np.array([0, 1, 2, 3, -1, -1, -1, -1], np.int32))
        qu, qt = keyframe_db.compute_bow_row(qw, idf, qw >= 0)
        q = keyframe_db.dense_bow(qu, qt, 16)
        cw = np.asarray(keyframe_db.common_words(db, q))
        assert cw[0] == 4 and cw[1] == 3 and cw[2] == 0
        covis = jnp.zeros((8, 8), jnp.int32)
        cand, s = keyframe_db.detect_candidates(db, q, jnp.zeros(8, bool), covis)
        cand = np.asarray(cand)
        assert cand[0] and not cand[2]
