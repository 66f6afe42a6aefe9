"""Drive System around a textured room and A/B loop closure on/off.

The octagonal-room two-lap fixture (shallow corners keep tracking alive
through the turns — a square room's 90-degree corners lose it at the
first corner). Expected (N=200): loop on closes 2 loops and roughly
halves ATE vs loop off. tests/test_loop_e2e.py gates a shortened
single-run version of this in CI.

Usage: JAX_PLATFORMS=cpu python tools/try_loop.py [n_frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# sitecustomize imports jax with the TPU plugin before env vars apply;
# force the platform through config (same trick as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

import numpy as np

from orb_slam_cuda_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from orb_slam_cuda_tpu.engine import Sensor, System, SystemConfig
from orb_slam_cuda_tpu.geometry.camera import Camera
from orb_slam_cuda_tpu.utils import synthetic
from orb_slam_cuda_tpu.utils.evaluation import ate_rmse, camera_centers

W, H = 320, 240
N = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def run(enable_loop):
    rng = np.random.default_rng(7)
    cam = Camera.create(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, width=W, height=H)
    scene = synthetic.room_scene(rng, half_size=8.0, tex_size=768, n_walls=8)
    poses = synthetic.loop_trajectory(N, radius=2.5, overshoot=1.0)
    cfg = SystemConfig(
        camera=cam, sensor=Sensor.MONOCULAR, n_features=800,
        max_keyframes=128, max_points=16384,
        enable_loop_closing=enable_loop,
        max_frames_between_kf=3, min_frames_between_kf=1,
        kf_ref_ratio=1.1, kf_cull_redundancy=1.1,
    )
    slam = System(cfg, seed=1)
    K = np.asarray(cam.K)
    gt = []
    t0 = time.time()
    last_state = None
    for i, T in enumerate(poses):
        slam.track_monocular(scene.render(K, T, W, H), i * 0.1)
        gt.append((i * 0.1, np.linalg.inv(T)[:3, 3]))
        st_name = slam.tracking_state.name
        if st_name != last_state:
            print(f"  frame {i}: {last_state} -> {st_name} "
                  f"kfs={slam.stats.n_keyframes} inl={getattr(slam,'n_inliers_local',-1)}")
            last_state = st_name
    ts, est = camera_centers(slam.get_trajectory())
    gt_map = dict((round(t, 6), c) for t, c in gt)
    gta = np.asarray([gt_map[round(t, 6)] for t in ts])
    ate = ate_rmse(est, gta)
    st = slam.get_status()
    print(
        f"loop={enable_loop}: {time.time()-t0:.0f}s state={st['state']} "
        f"tracked={st['tracked_ratio']} kfs={st['keyframes']} "
        f"loops={st['loops_closed']} ate={ate:.4f} n_est={len(est)}"
    )
    return ate, st


ate_off, _ = run(False)
ate_on, st = run(True)
print(f"ATE off={ate_off:.4f} on={ate_on:.4f}")
