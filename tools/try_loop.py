"""Drive System around a textured room and A/B loop closure on/off.

Two fixtures:

* default (circuit): KITTI-style forward circuit (synthetic.
  circuit_trajectory) under the REFERENCE keyframe policy — zero
  kf_ref_ratio / kf_cull_redundancy overrides. This is the fixture
  tests/test_loop_e2e.py gates: expected (N=330) 1 loop closed at the
  revisit, ATE ~0.42 with loop closing vs ~0.63 without, 92% tracked.
* --yaw: the legacy in-place-yaw fixture (loop_trajectory) with the
  dense-cadence overrides. Kept for comparison: its lap-2 views stay
  covisibility-connected to lap-1, so under the natural policy the map
  just bends (tracking re-latches seamlessly) and DetectLoop correctly
  never fires — it gates loop closure only in the override regime.

Usage: JAX_PLATFORMS=cpu python tools/try_loop.py [n_frames] [--yaw]
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
YAW = "--yaw" in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(args[0]) if args else (200 if YAW else 360)


def run(enable_loop):
    rng = np.random.default_rng(7)
    cam = Camera.create(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, width=W, height=H)
    if YAW:
        scene = synthetic.room_scene(rng, half_size=8.0, tex_size=768, n_walls=8)
        poses = synthetic.loop_trajectory(N, radius=2.5, overshoot=1.0)
        cfg = SystemConfig(
            camera=cam, sensor=Sensor.MONOCULAR, n_features=800,
            max_keyframes=128, max_points=16384,
            enable_loop_closing=enable_loop,
            max_frames_between_kf=3, min_frames_between_kf=1,
            kf_ref_ratio=1.1, kf_cull_redundancy=1.1,
        )
    else:
        scene = synthetic.room_scene(rng, half_size=9.0, tex_size=1024, n_walls=8)
        poses = synthetic.circuit_trajectory(N, radius=5.0, laps=1.3)
        cfg = SystemConfig(
            camera=cam, sensor=Sensor.MONOCULAR, n_features=800,
            max_keyframes=128, max_points=16384,
            enable_loop_closing=enable_loop,
            max_frames_between_kf=30, min_frames_between_kf=0,
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
        f"live={len(slam.kf_order)} loops={st['loops_closed']} "
        f"ate={ate:.4f} n_est={len(est)}"
    )
    return ate, st


ate_off, _ = run(False)
ate_on, st = run(True)
print(f"ATE off={ate_off:.4f} on={ate_on:.4f}")
