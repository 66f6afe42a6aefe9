"""Cross-map alignment and merging for multi-sequence work sharding.

The BASELINE `stereo_euroc` configuration shards N sequences (EuRoC
MH_01-MH_05 style: different trajectories through the SAME hall) over N
hosts: each rank tracks its own sequence into a rank-local map, then the
maps are aligned by place recognition + Sim3 and merged into one, and a
DISTRIBUTED global BA over the merged map (parallel/dist_ba.py,
observation-sharded over the process mesh) polishes the joint estimate.

The single-box reference has no counterpart — its only "distribution" is
shelling out to the CUDA pba_driver on the same machine
(reference src/Optimizer.cc:61-73); the cross-map machinery reused here
is its loop-closure funnel (SearchByBoW -> Sim3 RANSAC,
src/LoopClosing.cc:267-440) applied across maps instead of within one.

All merge orchestration is host-side numpy (merging is a rare,
checkpoint-rate event); the heavy steps — BoW scoring, descriptor
matching, Sim3 RANSAC, the merged global BA — are the same jitted/
shard_map programs the engine uses online.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3, sim3
from ..geometry.camera import Camera
from ..matching import search
from ..ops import hamming
from ..slam_map import MapConfig, MapState, keyframe_db, state as mstate
from ..slam_map import ops as map_ops
from ..solvers import bundle_adjust as ba
from ..solvers import sim3_solver


def find_cross_map_link(
    state_a: MapState, db_a, state_b: MapState, kf_b: int,
    cam: Camera, scale_factors, level_sigma2,
    n_words: int, fix_scale: bool = True,
    min_inliers: int = 20, top_candidates: int = 3, seed: int = 0,
    word_weight=None,
):
    """Locate keyframe `kf_b` of map B inside map A and estimate the
    B-world -> A-world similarity.

    Returns (kf_a, S_ab) with S_ab = (R, t, s) such that
    p_a = S_ab(p_b), or (None, None) if no candidate passes the Sim3
    gate. `fix_scale=True` for stereo/RGBD maps (both metric)."""
    # BoW retrieval against A's database (reloc-style: no exclusions).
    # Query idf weights must match the convention A's rows were inserted
    # with; pass the vocabulary's word_weight for exactness (uniform
    # weights still rank candidates usefully on synthetic vocabularies).
    wq = state_b.kf_word[kf_b]
    if word_weight is not None:
        idf = jnp.asarray(word_weight)[jnp.clip(wq, 0)]
    else:
        idf = jnp.ones_like(state_b.kf_ang[kf_b])
    q_dense = keyframe_db.dense_bow(
        *keyframe_db.compute_bow_row(wq, idf, state_b.kf_feat_valid[kf_b]),
        n_words,
    )
    s_scores = keyframe_db.scores(db_a, q_dense)
    s_np = np.asarray(jnp.where(state_a.kf_valid, s_scores, -1.0))
    order = np.argsort(-s_np)[:top_candidates]

    sig2 = np.asarray(level_sigma2, np.float32)
    sf = jnp.asarray(scale_factors, jnp.float32)
    b_bip = hamming.bipolar(state_b.kf_desc[kf_b])
    mp_b = np.asarray(state_b.kf_mp[kf_b])
    b_valid_np = np.asarray(state_b.kf_feat_valid[kf_b])
    mpb_ok = (mp_b >= 0) & b_valid_np
    mpb_ok &= np.asarray(state_b.mp_valid)[np.clip(mp_b, 0, None)]

    for kf_a in order:
        kf_a = int(kf_a)
        if s_np[kf_a] <= 0:
            continue
        mp_a = np.asarray(state_a.kf_mp[kf_a])
        a_has = (mp_a >= 0) & np.asarray(state_a.kf_feat_valid[kf_a])
        a_has &= np.asarray(state_a.mp_valid)[np.clip(mp_a, 0, None)]
        m = search.by_bow(
            state_a.kf_node[kf_a], hamming.bipolar(state_a.kf_desc[kf_a]),
            state_a.kf_feat_valid[kf_a], state_a.kf_ang[kf_a],
            state_b.kf_node[kf_b], b_bip,
            state_b.kf_feat_valid[kf_b], state_b.kf_ang[kf_b],
            ratio=0.75, check_rotation=True,
            f1_has_point=jnp.asarray(a_has),
        )
        idx = np.asarray(m.idx)  # A-feature i -> B-feature idx[i]
        j = np.clip(idx, 0, None)
        pair_ok = (idx >= 0) & a_has & mpb_ok[j]
        if int(pair_ok.sum()) < min_inliers:
            continue

        # Camera-frame point sets for the Sim3 solve + its bidirectional
        # reprojection gates (mirrors the loop funnel's prep).
        p_a = np.clip(mp_a, 0, None)
        p_b = np.clip(mp_b[j], 0, None)
        T_a = state_a.kf_pose[kf_a]
        T_b = state_b.kf_pose[kf_b]
        x1 = se3.transform(T_a, state_a.mp_xyz[jnp.asarray(p_a)])
        x2 = se3.transform(T_b, state_b.mp_xyz[jnp.asarray(p_b)])
        oct_a = np.asarray(state_a.kf_oct[kf_a])
        oct_b = np.asarray(state_b.kf_oct[kf_b])[j]
        th1 = 9.210 * sig2[np.clip(oct_a, 0, len(sig2) - 1)]
        th2 = 9.210 * sig2[np.clip(oct_b, 0, len(sig2) - 1)]
        res = sim3_solver.solve_sim3_ransac(
            x1, x2, state_a.kf_uv[kf_a],
            state_b.kf_uv[kf_b][jnp.asarray(j)],
            jnp.asarray(pair_ok), cam,
            jax.random.PRNGKey(seed * 997 + kf_a),
            jnp.asarray(th1), jnp.asarray(th2),
            fix_scale=fix_scale, min_inliers=min_inliers,
        )
        if not bool(res.ok):
            continue
        # S_12: cam_b -> cam_a. World alignment:
        # p_a = T_a^-1( S_12( T_b(p_b) ) )  =>  S_ab = S_a^-1 ∘ S_12 ∘ S_b.
        S_a = sim3.from_se3(T_a)
        S_b = sim3.from_se3(T_b)
        S_12 = (res.R, res.t, res.s)
        S_ab = sim3.compose(sim3.inverse(S_a), sim3.compose(S_12, S_b))
        return kf_a, S_ab
    return None, None


def merge_maps(
    state_a: MapState, kf_order_a: List[int], db_a,
    state_b: MapState, kf_order_b: List[int], db_b,
    S_ab, cfg: MapConfig,
) -> Tuple[MapState, object, List[int], dict, dict]:
    """Merge map B into map A's frame under S_ab (p_a = S_ab(p_b)).

    A's keyframe/point slots are preserved; B's live keyframes and valid
    points are repacked into free slots. B's poses fold the similarity's
    scale into translation exactly like CorrectLoop
    (reference src/LoopClosing.cc:506-540 / sim3.to_se3); for the
    stereo/RGBD fix-scale case s=1 and stereo depth columns stay metric.

    Returns (merged_state, merged_db, kf_order, kf_slot_map, pt_slot_map)
    where the maps take B slots -> merged slots."""
    K, N = cfg.max_keyframes, cfg.max_features
    P = cfg.max_points
    KA, NA = state_a.kf_mp.shape
    if NA != N:
        raise ValueError("feature capacity mismatch")

    a = state_a._asdict()
    out = {k: np.asarray(v).copy() for k, v in mstate.empty(cfg)._asdict().items()}
    # --- copy A verbatim into the head of each axis ---
    for k, v in a.items():
        v = np.asarray(v)
        if k == "covis":
            out[k][:KA, :KA] = v
        elif k.startswith("kf_"):
            out[k][:KA] = v
        else:
            out[k][: v.shape[0]] = v

    kf_used = np.zeros(K, bool)
    kf_used[np.asarray(state_a.kf_valid)[:KA].nonzero()[0]] = True
    pt_used = np.asarray(state_a.mp_valid).copy()
    if pt_used.shape[0] < P:
        pt_used = np.concatenate([pt_used, np.zeros(P - pt_used.shape[0], bool)])

    free_kf = [i for i in range(K) if not kf_used[i]]
    free_pt = np.flatnonzero(~pt_used)

    b_valid = np.asarray(state_b.kf_valid)
    b_kfs = [s for s in kf_order_b if b_valid[s]]
    if len(b_kfs) > len(free_kf):
        raise ValueError("merged keyframe capacity too small")
    kf_slot_map = {b: free_kf[i] for i, b in enumerate(b_kfs)}

    bp_valid = np.asarray(state_b.mp_valid)
    b_pts = np.flatnonzero(bp_valid)
    if len(b_pts) > len(free_pt):
        raise ValueError("merged point capacity too small")
    pt_slot_map_arr = np.full(bp_valid.shape[0], -1, np.int64)
    pt_slot_map_arr[b_pts] = free_pt[: len(b_pts)]

    # --- transform B geometry into A's world ---
    R, t, s = (np.asarray(x, np.float64) for x in S_ab)
    xyz_b = np.asarray(state_b.mp_xyz, np.float64)
    xyz_new = (s * (xyz_b @ R.T)) + t
    normal_b = np.asarray(state_b.mp_normal, np.float64) @ R.T
    S_inv = sim3.inverse(tuple(jnp.asarray(x) for x in S_ab))
    pose_b = np.asarray(state_b.kf_pose)

    b = state_b._asdict()
    for bslot, mslot in kf_slot_map.items():
        for k in b:
            if not k.startswith("kf_") or k == "kf_valid":
                continue
            if k == "kf_pose":
                S_new = sim3.compose(
                    sim3.from_se3(jnp.asarray(pose_b[bslot])), S_inv
                )
                out[k][mslot] = np.asarray(sim3.to_se3(S_new))
            elif k == "kf_mp":
                row = np.asarray(b[k][bslot])
                remap = np.where(
                    row >= 0, pt_slot_map_arr[np.clip(row, 0, None)], -1
                )
                out[k][mslot] = remap
            elif k == "kf_depth":
                out[k][mslot] = np.where(
                    np.asarray(b[k][bslot]) >= 0,
                    np.asarray(b[k][bslot]) * s, -1.0,
                )
            else:
                out[k][mslot] = np.asarray(b[k][bslot])
        out["kf_valid"][mslot] = True

    dst = pt_slot_map_arr[b_pts]
    out["mp_xyz"][dst] = xyz_new[b_pts].astype(np.float32)
    out["mp_valid"][dst] = True
    out["mp_desc"][dst] = np.asarray(state_b.mp_desc)[b_pts]
    out["mp_normal"][dst] = normal_b[b_pts].astype(np.float32)
    out["mp_min_dist"][dst] = np.asarray(state_b.mp_min_dist)[b_pts] * s
    out["mp_max_dist"][dst] = np.asarray(state_b.mp_max_dist)[b_pts] * s
    out["mp_visible"][dst] = np.asarray(state_b.mp_visible)[b_pts]
    out["mp_found"][dst] = np.asarray(state_b.mp_found)[b_pts]
    ref_b = np.asarray(state_b.mp_ref_kf)[b_pts]
    kf_map_arr = np.full(pose_b.shape[0], -1, np.int64)
    for bslot, mslot in kf_slot_map.items():
        kf_map_arr[bslot] = mslot
    out["mp_ref_kf"][dst] = np.where(
        ref_b >= 0, kf_map_arr[np.clip(ref_b, 0, None)], -1
    ).astype(np.int32)
    out["mp_first_kf"][dst] = out["mp_ref_kf"][dst]

    merged = MapState(**{k: jnp.asarray(v) for k, v in out.items()})
    merged = merged._replace(covis=map_ops.covisibility_matrix(merged))

    # --- merged BoW database ---
    word = np.full((K, db_a.word.shape[1]), -1, np.int32)
    weight = np.zeros((K, db_a.word.shape[1]), np.float32)
    valid = np.zeros(K, bool)
    word[:KA] = np.asarray(db_a.word)
    weight[:KA] = np.asarray(db_a.weight)
    valid[:KA] = np.asarray(db_a.valid)
    for bslot, mslot in kf_slot_map.items():
        word[mslot] = np.asarray(db_b.word[bslot])
        weight[mslot] = np.asarray(db_b.weight[bslot])
        valid[mslot] = bool(db_b.valid[bslot])
    dbm = keyframe_db.BowDB(
        word=jnp.asarray(word), weight=jnp.asarray(weight),
        valid=jnp.asarray(valid),
    )

    kf_order = [s for s in kf_order_a if kf_used[s]] + [
        kf_slot_map[bslot] for bslot in b_kfs
    ]
    pt_slot_map = {int(p): int(pt_slot_map_arr[p]) for p in b_pts}
    return merged, dbm, kf_order, kf_slot_map, pt_slot_map


def fuse_seam(state: MapState, cfg: MapConfig, kfs_into, pts_from_mask,
              cam: Camera, scale_factors):
    """Fuse the masked point set into each keyframe of `kfs_into` —
    CorrectLoop's SearchAndFuse (reference src/LoopClosing.cc:639-670)
    applied at a map-merge seam. Without this the merged map has ZERO
    cross-map observations: global BA sees two independent components
    (gauge-fixed only on one side) and cannot improve on the single-pair
    Sim3 alignment. Fusion binds/merges duplicate landmarks in the
    overlap so the seam carries reprojection constraints."""
    from ..engine.loop_closing import pow2_bucket
    from ..engine import local_mapping

    sf = jnp.asarray(scale_factors, jnp.float32)
    n = int(jnp.sum(pts_from_mask))
    if n == 0 or not kfs_into:
        return state
    bucket = pow2_bucket(n, 1024, cfg.max_points)
    pts = jnp.nonzero(pts_from_mask, size=bucket, fill_value=-1)[0].astype(
        jnp.int32
    )
    for g in kfs_into:
        m = local_mapping.fuse_into_keyframe(state, pts, np.int32(g), cam, sf)
        state = local_mapping.apply_fusion(state, np.int32(g), pts, m.idx)
    state = map_ops.update_point_stats(state, cfg)
    state = map_ops.refresh_covis_rows(
        state, jnp.asarray(sorted(kfs_into), jnp.int32)
    )
    return state


def merged_global_ba(
    state: MapState, kf_order: List[int], cfg: MapConfig, cam: Camera,
    mesh=None, lm_iters: int = 10, cg_iters: int = 20,
):
    """Distributed (or single-device) global BA over the merged map —
    the BASELINE north-star solve: observation-sharded LM+PCG across the
    process mesh (parallel/dist_ba.py). Returns the refined state."""
    from ..engine.loop_closing import gather_global_ba_problem, pow2_bucket

    C = pow2_bucket(len(kf_order), 32, cfg.max_keyframes)
    cam_slots = np.full(C, -1, np.int32)
    cam_slots[: len(kf_order)] = kf_order
    problem, cam_slots_j, _ = gather_global_ba_problem(
        state, jnp.asarray(cam_slots), jnp.int32(kf_order[0]),
        jnp.asarray(cfg.level_sigma2, jnp.float32),
    )
    if mesh is not None:
        from . import dist_ba

        res = dist_ba.distributed_bundle_adjust(
            problem, cam, mesh, lm_iters=lm_iters, cg_iters=cg_iters,
        )
    else:
        res = ba.bundle_adjust_impl(
            problem, cam, lm_iters=lm_iters, cg_iters=cg_iters,
        )
    idx = jnp.where(jnp.asarray(cam_slots) >= 0, jnp.asarray(cam_slots),
                    cfg.max_keyframes)
    kf_pose = state.kf_pose.at[idx].set(res.cam_pose, mode='drop')
    mp_xyz = jnp.where(state.mp_valid[:, None], res.xyz, state.mp_xyz)
    return state._replace(kf_pose=kf_pose, mp_xyz=mp_xyz)
