"""Full-system loop closure gate.

The fork's flagship behavior (reference src/LoopClosing.cc:441-638) must
fire through the REAL System pipeline — detection, Sim3 verification,
correction, essential graph, global BA — not just at map level. The
fixture is an octagonal textured room with a 1.4-lap in-place yaw
trajectory: the revisit after 360 degrees triggers detection, and the
second-lap frames then track against the corrected map.

Gate values (measured, tools/try_loop.py): with loop closing the run
closes >=1 loop and lands at ATE ~0.099; with loop closing DISABLED the
same run drifts to ATE ~0.140. The threshold 0.12 sits between them, so
the test fails both if the loop stops closing and if the correction
stops helping.
"""

import numpy as np
import pytest

from orb_slam_cuda_tpu.engine import Sensor, System, SystemConfig
from orb_slam_cuda_tpu.geometry.camera import Camera
from orb_slam_cuda_tpu.utils import synthetic
from orb_slam_cuda_tpu.utils.evaluation import ate_rmse, camera_centers

W, H = 320, 240
N_FRAMES = 145


class TestLoopClosureEndToEnd:
    def test_closes_loop_and_reduces_ate(self):
        rng = np.random.default_rng(7)
        cam = Camera.create(
            fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, width=W, height=H
        )
        scene = synthetic.room_scene(rng, half_size=8.0, tex_size=768,
                                     n_walls=8)
        poses = synthetic.loop_trajectory(N_FRAMES, radius=2.5,
                                          overshoot=1.0)
        cfg = SystemConfig(
            camera=cam, sensor=Sensor.MONOCULAR, n_features=800,
            max_keyframes=128, max_points=16384,
            enable_loop_closing=True,
            max_frames_between_kf=3, min_frames_between_kf=1,
            kf_ref_ratio=1.1, kf_cull_redundancy=1.1,
        )
        slam = System(cfg, seed=1)
        K = np.asarray(cam.K)
        gt = []
        for i, T in enumerate(poses):
            slam.track_monocular(scene.render(K, T, W, H), i * 0.1)
            gt.append((i * 0.1, np.linalg.inv(T)[:3, 3]))
        st = slam.get_status()
        assert st["loops_closed"] >= 1, st
        assert st["tracked_ratio"] > 0.95, st
        ts, est = camera_centers(slam.get_trajectory())
        gt_map = dict((round(t, 6), c) for t, c in gt)
        gta = np.asarray([gt_map[round(t, 6)] for t in ts])
        ate = ate_rmse(est, gta)
        # 0.12 < measured loop-OFF ATE (0.140): passing requires the
        # correction to actually improve the trajectory.
        assert ate < 0.12, f"loop-closed ATE {ate:.4f}"
