"""Full-system loop closure gate — ZERO keyframe-policy overrides.

The fork's flagship behavior (reference src/LoopClosing.cc:441-638) must
fire through the REAL System pipeline — detection, Sim3 verification,
correction, essential graph, global BA — under the reference's OWN
keyframe policy: thRefRatio=0.9 mono (src/Tracking.cc:1099-1105),
KeyFrameCulling at 0.9 redundancy (src/LocalMapping.cc:668-736),
mMinFrames=0 / mMaxFrames=30 (src/Tracking.cc:137-138). No kf_ref_ratio,
no kf_cull_redundancy, no cadence overrides.

The fixture is a KITTI-style circuit (synthetic.circuit_trajectory): the
camera rides a 5 m circle inside a 9 m octagonal room looking forward,
leaving each wall section behind and revisiting the start for 0.3 laps
with accumulated mono drift. An in-place yaw fixture cannot gate this
behavior: its lap-2 views stay covisibility-connected to lap-1, so
re-entry latches seamlessly and DetectLoop (correctly) never proposes a
candidate — measured ATE 0.459 with zero loops on the yaw fixture vs a
genuine detection->Sim3->correction chain here.

The gate is a same-fixture A/B (loop closing enabled vs disabled) so it
keeps meaning as the engine evolves: the enabled run must actually close
a loop AND beat the disabled run's ATE by a clear margin. Measured
(tools/try_loop.py): ON 1 loop / ATE ~0.50, OFF 0 loops / ATE ~0.63,
92.2% tracked both.
"""

import numpy as np
import pytest

from orb_slam_cuda_tpu.engine import Sensor, System, SystemConfig
from orb_slam_cuda_tpu.geometry.camera import Camera
from orb_slam_cuda_tpu.utils import synthetic
from orb_slam_cuda_tpu.utils.evaluation import ate_rmse, camera_centers

W, H = 320, 240
N_FRAMES = 360
LAPS = 1.3


def _run(enable_loop):
    rng = np.random.default_rng(7)
    cam = Camera.create(
        fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, width=W, height=H
    )
    scene = synthetic.room_scene(rng, half_size=9.0, tex_size=1024,
                                 n_walls=8)
    poses = synthetic.circuit_trajectory(N_FRAMES, radius=5.0, laps=LAPS)
    cfg = SystemConfig(
        camera=cam, sensor=Sensor.MONOCULAR, n_features=800,
        max_keyframes=128, max_points=16384,
        enable_loop_closing=enable_loop,
        # Reference-default keyframe policy: mMinFrames=0, mMaxFrames=fps
        # (src/Tracking.cc:137-138). Everything else (thRefRatio,
        # culling) stays at the engine defaults, which ARE the reference
        # values.
        max_frames_between_kf=30, min_frames_between_kf=0,
    )
    slam = System(cfg, seed=1)
    K = np.asarray(cam.K)
    gt = []
    for i, T in enumerate(poses):
        slam.track_monocular(scene.render(K, T, W, H), i * 0.1)
        gt.append((i * 0.1, np.linalg.inv(T)[:3, 3]))
    st = slam.get_status()
    ts, est = camera_centers(slam.get_trajectory())
    gt_map = dict((round(t, 6), c) for t, c in gt)
    gta = np.asarray([gt_map[round(t, 6)] for t in ts])
    return slam, st, ate_rmse(est, gta)


@pytest.mark.slow
class TestLoopClosureEndToEnd:
    def test_closes_loop_and_reduces_ate_reference_policy(self):
        slam_off, st_off, ate_off = _run(False)
        slam_on, st_on, ate_on = _run(True)

        assert st_on["loops_closed"] >= 1, st_on
        assert st_on["tracked_ratio"] > 0.85, st_on
        assert st_off["tracked_ratio"] > 0.85, st_off
        # KeyFrameCulling must be live under the reference policy.
        assert len(slam_on.kf_order) < slam_on.stats.n_keyframes, (
            len(slam_on.kf_order), slam_on.stats.n_keyframes)
        # The correction must actually improve the trajectory vs the
        # identical run without loop closing.
        assert ate_on < 0.92 * ate_off, (
            f"loop-on ATE {ate_on:.4f} vs loop-off {ate_off:.4f}")
