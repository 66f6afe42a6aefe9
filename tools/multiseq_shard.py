"""Multi-sequence work sharding: the BASELINE `stereo_euroc` story.

N ranks, N DIFFERENT stereo sequences through the SAME hall (the EuRoC
MH_01-MH_05 shape: separate flights, one machine room). Each rank tracks
its OWN sequence into a rank-local map — real work sharding, total
frames processed scales with ranks — then the maps are aligned by
cross-map place recognition + fixed-scale Sim3
(parallel/map_merge.find_cross_map_link), merged into one map, and a
DISTRIBUTED global BA over the merged map runs observation-sharded
across the jax.distributed process mesh (parallel/dist_ba.py — the
collectives cross the process boundary).

The single-box reference's only counterpart is shelling out to
pba_driver on the same machine (reference src/Optimizer.cc:61-73); the
cross-map funnel reuses its loop-closure machinery (SearchByBoW + Sim3
RANSAC, src/LoopClosing.cc:267-440) across maps.

Reports per-rank tracking throughput, total frames/s (the scaling
metric vs one rank), and merged-map keyframe ATE vs ground truth for
BOTH sequences. NOTE on scaling numbers: this host time-shares 2 cores,
so parallel-phase fps measures CPU contention + sharding overhead, not
real 2-host scaling; the sharding structure (independent tracking, one
cross-process solve) is what carries to real hosts.

Usage: python tools/multiseq_shard.py    (parent; spawns 2 ranks)
Prints one JSON line on stdout.
"""
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = int(os.environ.get("MS_PORT", "12391"))
FRAMES_PER_RANK = int(os.environ.get("MS_FRAMES", "120"))
TMP = "/tmp/multiseq_shard"

W, H = 320, 240
BASELINE_M = 0.2
RADIUS = 2.6
SEG_LAPS = 0.62  # each rank's arc; overlap with the next rank's start


def rank_poses(rank: int):
    from orb_slam_cuda_tpu.utils import synthetic

    return synthetic.circuit_trajectory(
        FRAMES_PER_RANK, radius=RADIUS, laps=SEG_LAPS, start=0.5 * rank
    )


def child(rank: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from orb_slam_cuda_tpu.parallel.multihost import initialize_distributed

    assert initialize_distributed(
        coordinator=f"localhost:{PORT}", num_processes=N_PROC, process_id=rank
    )
    import numpy as np
    from jax.sharding import Mesh
    from jax.experimental import multihost_utils

    from orb_slam_cuda_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from orb_slam_cuda_tpu.engine import Sensor, System, SystemConfig
    from orb_slam_cuda_tpu.geometry.camera import Camera
    from orb_slam_cuda_tpu.io import checkpoint
    from orb_slam_cuda_tpu.utils import synthetic

    os.makedirs(TMP, exist_ok=True)
    rng = np.random.default_rng(7)  # SAME hall on every rank
    cam = Camera.create(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2,
                        bf=260.0 * BASELINE_M, width=W, height=H)
    scene = synthetic.room_scene(rng, half_size=6.0, tex_size=768, n_walls=10)
    poses = rank_poses(rank)
    K = np.asarray(cam.K)

    cfg = SystemConfig(
        camera=cam, sensor=Sensor.STEREO, n_features=800,
        max_keyframes=96, max_points=12288,
        enable_loop_closing=False,  # intra-sequence arcs don't loop
    )
    slam = System(cfg, seed=1)

    # --- Phase 1: per-rank tracking of DIFFERENT sequences (the work
    # sharding). The per-frame barrier is pacing only — on this
    # time-shared host unsynced ranks drift past Gloo's ~30 s collective
    # rendezvous window and the maps_saved barrier would time out; a
    # real multi-host run is implicitly paced by its camera feeds. ---
    from jax.experimental import multihost_utils as mhu

    t0 = time.perf_counter()
    for i, T in enumerate(poses):
        left, right = scene.render_stereo(K, T, BASELINE_M, W, H)
        slam.track_stereo(left, right, i * 0.1)
        mhu.sync_global_devices(f"f")
    slam._flush_pipeline()
    track_wall = time.perf_counter() - t0

    # Rank-local trajectory quality BEFORE any merging (decomposes the
    # merged ATE into per-rank drift vs seam-alignment error).
    from orb_slam_cuda_tpu.utils.evaluation import ate_rmse, camera_centers

    ts_l, est_l = camera_centers(slam.get_trajectory())
    gt_l = np.asarray(
        [np.linalg.inv(poses[int(round(t / 0.1))])[:3, 3] for t in ts_l]
    )
    local_ate = float(ate_rmse(est_l, gt_l, with_scale=False))

    ckpt = f"{TMP}/rank{rank}.npz"
    checkpoint.save_map(slam.state, slam.db, slam.kf_order, ckpt, extra={
        "kf_timestamps": np.asarray(
            [slam.kf_timestamps.get(s, -1.0) for s in range(cfg.max_keyframes)]
        ),
    })
    np.save(f"{TMP}/gt{rank}.npy", np.asarray(poses))
    multihost_utils.sync_global_devices("maps_saved")

    # --- Phase 2: merge + DISTRIBUTED global BA (host-SPMD: every rank
    # executes the identical merge so the mesh-wide solve sees identical
    # inputs). ---
    from orb_slam_cuda_tpu.parallel import map_merge
    from orb_slam_cuda_tpu.slam_map import MapConfig

    t1 = time.perf_counter()
    state_a, db_a, order_a, extra_a = checkpoint.load_map(f"{TMP}/rank0.npz")
    state_b, db_b, order_b, extra_b = checkpoint.load_map(f"{TMP}/rank1.npz")

    link = None
    for kf_b in order_b:
        kf_a, S_ab = map_merge.find_cross_map_link(
            state_a, db_a, state_b, int(kf_b), cam,
            slam.map_cfg.scale_factors, slam.map_cfg.level_sigma2,
            slam.vocab.n_words, fix_scale=True,
            word_weight=slam.vocab.word_weight,
        )
        if kf_a is not None:
            link = (int(kf_b), kf_a, S_ab)
            break
    assert link is not None, "no cross-map link found"
    kf_b_link, kf_a_link, S_ab = link

    merged_cfg = MapConfig(
        max_keyframes=192, max_features=cfg.n_features,
        max_points=24576, n_levels=slam.map_cfg.n_levels,
        scale_factor=slam.map_cfg.scale_factor,
    )
    merged, dbm, order_m, kf_map, pt_map = map_merge.merge_maps(
        state_a, order_a, db_a, state_b, order_b, db_b, S_ab, merged_cfg,
    )

    # Seam fusion (the CorrectLoop SearchAndFuse counterpart): bind A's
    # link-neighborhood points into B's overlap keyframes and vice versa
    # so the merged GBA has cross-map reprojection constraints.
    from orb_slam_cuda_tpu.slam_map import ops as map_ops
    import jax.numpy as jnp

    covis_m = np.asarray(merged.covis)
    a_link = kf_a_link
    b_link = kf_map[kf_b_link]
    a_group = sorted(
        ({a_link} | set(np.flatnonzero(covis_m[a_link] > 0)))
        & set(order_a)
    )
    b_slots = set(kf_map.values())
    b_group = sorted(
        ({b_link} | set(np.flatnonzero(covis_m[b_link] > 0))) & b_slots
    )
    a_mask = np.zeros(merged_cfg.max_keyframes, bool)
    a_mask[a_group] = True
    b_mask = np.zeros(merged_cfg.max_keyframes, bool)
    b_mask[b_group] = True
    pts_a = map_ops.points_of_keyframes(merged, jnp.asarray(a_mask))
    pts_b = map_ops.points_of_keyframes(merged, jnp.asarray(b_mask))
    merged = map_merge.fuse_seam(
        merged, merged_cfg, b_group, pts_a, cam, slam.map_cfg.scale_factors
    )
    merged = map_merge.fuse_seam(
        merged, merged_cfg, a_group, pts_b, cam, slam.map_cfg.scale_factors
    )

    # Seam health: cross-map covisibility edges created by the fusion
    # (0 would mean the GBA still sees two disconnected components).
    covis_f = np.asarray(merged.covis)
    a_idx = np.asarray(sorted(set(order_a)), np.int64)
    b_idx = np.asarray(sorted(b_slots), np.int64)
    cross_edges = int((covis_f[np.ix_(a_idx, b_idx)] > 0).sum())

    mesh = Mesh(np.asarray(jax.devices()), ("obs",))
    merged_ba = map_merge.merged_global_ba(
        merged, order_m, merged_cfg, cam, mesh=mesh, lm_iters=10, cg_iters=20,
    )
    jax.block_until_ready(merged_ba.kf_pose)
    merge_wall = time.perf_counter() - t1

    # --- Merged keyframe ATE vs ground truth over BOTH sequences. ---
    gt0 = np.load(f"{TMP}/gt0.npy")
    gt1 = np.load(f"{TMP}/gt1.npy")
    ts_a = np.asarray(extra_a["kf_timestamps"])
    ts_b = np.asarray(extra_b["kf_timestamps"])
    kf_pose = np.asarray(merged_ba.kf_pose, np.float64)
    est, gt = [], []
    for slot in order_m:
        in_b = slot in set(kf_map.values())
        if in_b:
            bslot = next(b for b, m in kf_map.items() if m == slot)
            t = float(ts_b[bslot])
            gt_T = gt1[int(round(t / 0.1))]
        else:
            t = float(ts_a[slot])
            gt_T = gt0[int(round(t / 0.1))]
        if t < 0:
            continue
        est.append(np.linalg.inv(kf_pose[slot])[:3, 3])
        gt.append(np.linalg.inv(gt_T)[:3, 3])
    from orb_slam_cuda_tpu.utils.evaluation import ate_rmse

    # Stereo + fixed-scale merge: rigid alignment only (metric check).
    ate = ate_rmse(np.asarray(est), np.asarray(gt), with_scale=False)

    digest = hashlib.sha256(
        np.asarray(merged_ba.kf_pose).tobytes()
    ).hexdigest()
    multihost_utils.sync_global_devices("run_done")
    print(json.dumps({
        "rank": rank,
        "devices_global": len(jax.devices()),
        "tracked_ratio": slam.tracked_ratio(),
        "keyframes_local": len(slam.kf_order),
        "frames": FRAMES_PER_RANK,
        "track_wall_s": round(track_wall, 1),
        "rank_fps": round(FRAMES_PER_RANK / track_wall, 2),
        "merge_wall_s": round(merge_wall, 1),
        "merged_kfs": len(order_m),
        "link": [kf_b_link, kf_a_link],
        "merged_ate_m": round(float(ate), 4),
        "local_ate_m": round(local_ate, 4),
        "cross_covis_edges": cross_edges,
        "merged_sha256": digest,
    }), flush=True)


def main():
    if "MS_RANK" in os.environ:
        child(int(os.environ["MS_RANK"]))
        return
    procs = []
    for r in range(N_PROC):
        env = dict(os.environ)
        env["MS_RANK"] = str(r)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    ok = True
    for p in procs:
        try:
            out, errtxt = p.communicate(timeout=3600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, errtxt = p.communicate()
        if p.returncode != 0:
            ok = False
            sys.stderr.write(errtxt[-3000:])
        for line in out.splitlines():
            if line.startswith("{"):
                outs.append(json.loads(line))
    if not ok or len(outs) != N_PROC:
        print(json.dumps({"metric": "multiseq_shard", "ok": False}))
        sys.exit(1)
    agree = outs[0]["merged_sha256"] == outs[1]["merged_sha256"]
    total_frames = sum(o["frames"] for o in outs)
    par_wall = max(o["track_wall_s"] for o in outs)
    # Gate the SEAM, not the rank-local drift it inherits: the merged
    # trajectory may not be much worse than the quadrature sum of the
    # per-rank errors, and the fusion must actually bridge the maps.
    worst_local = max(o["local_ate_m"] for o in outs)
    result = {
        "metric": "multiseq_shard",
        "ok": bool(
            agree
            and all(o["tracked_ratio"] > 0.85 for o in outs)
            and outs[0]["cross_covis_edges"] > 0
            and outs[0]["merged_ate_m"] < 2.0 * worst_local
            and outs[0]["merged_ate_m"] < 0.40
        ),
        "ranks_agree": agree,
        "processes": N_PROC,
        "total_frames": total_frames,
        "total_fps_parallel_phase": round(total_frames / par_wall, 2),
        "rank_fps": [o["rank_fps"] for o in outs],
        "tracked_ratio": [o["tracked_ratio"] for o in outs],
        "keyframes_local": [o["keyframes_local"] for o in outs],
        "merged_kfs": outs[0]["merged_kfs"],
        "merged_ate_m": outs[0]["merged_ate_m"],
        "local_ate_m": [o["local_ate_m"] for o in outs],
        "cross_covis_edges": outs[0]["cross_covis_edges"],
        "merge_wall_s": outs[0]["merge_wall_s"],
    }
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
