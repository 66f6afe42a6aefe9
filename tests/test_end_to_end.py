"""End-to-end SLAM tests on synthetic scenes with ATE gates.

The reference validates only via dataset runs + external ATE tooling
(SURVEY.md §4); these tests are the CI-runnable equivalent: rendered
planar scenes with exact ground truth, gated on sim(3)-aligned ATE-RMSE
relative to scene depth.
"""

import numpy as np
import pytest

from orb_slam_cuda_tpu.engine import Sensor, System, SystemConfig
from orb_slam_cuda_tpu.geometry.camera import Camera
from orb_slam_cuda_tpu.utils import synthetic
from orb_slam_cuda_tpu.utils.evaluation import ate_rmse, camera_centers

W, H = 320, 240


def run_sequence(slam, scene, poses, K):
    gt_centers = []
    for i, T in enumerate(poses):
        img = scene.render(K, T, W, H)
        slam.track_monocular(img, i * 0.1)
        gt_centers.append((i * 0.1, np.linalg.inv(T)[:3, 3]))
    ts, est = camera_centers(slam.get_trajectory())
    gt_map = dict((round(t, 6), c) for t, c in gt_centers)
    gt = np.asarray([gt_map[round(t, 6)] for t in ts])
    return est, gt


@pytest.fixture(scope="module")
def scene_and_cam():
    rng = np.random.default_rng(42)
    cam = Camera.create(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, width=W, height=H)
    scene = synthetic.PlanarScene.default(
        rng, depth=5.0, second_depth=8.0, extent=12.0, tex_size=768
    )
    return scene, cam


def make_system(cam, **kw):
    params = dict(
        camera=cam, sensor=Sensor.MONOCULAR, n_features=600,
        max_keyframes=64, max_points=8192, enable_loop_closing=False,
        max_frames_between_kf=10,
    )
    params.update(kw)
    return System(SystemConfig(**params))


class TestMonocularEndToEnd:
    def test_tracks_orbit_sequence(self, scene_and_cam):
        scene, cam = scene_and_cam
        poses = synthetic.orbit_trajectory(40, radius=0.6)
        slam = make_system(cam)
        est, gt = run_sequence(slam, scene, poses, np.asarray(cam.K))
        assert slam.tracked_ratio() > 0.85
        assert len(est) >= 30
        ate = ate_rmse(est, gt)
        # Scene depth 5m: gate at 2% of depth (observed ~0.05).
        assert ate < 0.10, f"ATE {ate:.3f} too high"

    def test_map_grows_and_culls(self, scene_and_cam):
        scene, cam = scene_and_cam
        poses = synthetic.orbit_trajectory(30, radius=0.5)
        slam = make_system(cam)
        run_sequence(slam, scene, poses, np.asarray(cam.K))
        n_pts = int(np.asarray(slam.state.mp_valid).sum())
        n_kfs = int(np.asarray(slam.state.kf_valid).sum())
        assert n_pts > 100
        assert 2 <= n_kfs <= 30
        # Observation table consistent: bound points are valid points.
        kf_mp = np.asarray(slam.state.kf_mp)
        mp_valid = np.asarray(slam.state.mp_valid)
        bound = kf_mp[kf_mp >= 0]
        assert mp_valid[bound].all()

    def test_static_camera_does_not_initialize(self, scene_and_cam):
        scene, cam = scene_and_cam
        T = np.eye(4)
        slam = make_system(cam)
        for i in range(6):
            slam.track_monocular(scene.render(np.asarray(cam.K), T, W, H), i * 0.1)
        assert slam.stats.n_keyframes == 0  # no parallax -> no map

    def test_pipelined_tracking_matches_sync(self, scene_and_cam):
        # pipeline_lag > 0 dispatches the fused step immediately and
        # consumes the scalar readback L frames late (hiding the device
        # round trip, SystemConfig.pipeline_lag). The lag skews keyframe
        # decisions by L frames but must not change accuracy class.
        scene, cam = scene_and_cam
        poses = synthetic.orbit_trajectory(40, radius=0.6)
        slam = make_system(cam, pipeline_lag=2)
        est, gt = run_sequence(slam, scene, poses, np.asarray(cam.K))
        assert slam.tracked_ratio() > 0.85
        assert len(est) >= 30
        ate = ate_rmse(est, gt)
        assert ate < 0.10, f"pipelined ATE {ate:.3f} too high"

    @pytest.mark.slow
    def test_pipelined_recovers_from_blackout(self, scene_and_cam):
        # Loss is discovered L frames late; the drain + relocalize path
        # must still recover (mirrors the sync blackout test below).
        scene, cam = scene_and_cam
        poses = synthetic.orbit_trajectory(44, radius=0.6)
        slam = make_system(
            cam, max_frames_between_kf=4, kf_cull_redundancy=1.1,
            pipeline_lag=2, kf_ref_ratio=1.1,
        )
        K = np.asarray(cam.K)
        blank = np.zeros((H, W), np.uint8)
        for i, T in enumerate(poses):
            img = blank if 30 <= i < 33 else scene.render(K, T, W, H)
            slam.track_monocular(img, i * 0.1)
        status = slam.get_status()  # flushes the pipeline
        assert slam.stats.n_lost >= 2
        assert slam.stats.n_reloc >= 1
        assert status["state"] == "OK"

    @pytest.mark.slow
    def test_capacity_growth(self, scene_and_cam):
        # Capacity doubling (SURVEY §7b): start with tiny keyframe/point
        # caps and an aggressive keyframe cadence; the engine must grow
        # instead of raising "capacity exhausted" (the round-1 failure
        # mode) and stay accurate across the recompiles.
        scene, cam = scene_and_cam
        poses = synthetic.orbit_trajectory(40, radius=0.6)
        slam = make_system(
            cam, max_keyframes=8, max_points=4096,
            max_frames_between_kf=3, kf_cull_redundancy=1.1,
            kf_ref_ratio=1.1,
        )
        est, gt = run_sequence(slam, scene, poses, np.asarray(cam.K))
        assert slam.stats.n_kf_grows >= 1
        assert slam.state.kf_valid.shape[0] >= 16
        assert slam.stats.n_keyframes > 8
        assert slam.tracked_ratio() > 0.85
        ate = ate_rmse(est, gt)
        assert ate < 0.10, f"post-growth ATE {ate:.3f} too high"

    @pytest.mark.slow
    def test_relocalizes_after_blackout(self, scene_and_cam):
        # Blackout placed late enough that the map has >5 keyframes —
        # losing earlier triggers the reference's small-map full reset
        # (src/Tracking.cc:537-544), which is separate behavior.
        scene, cam = scene_and_cam
        poses = synthetic.orbit_trajectory(44, radius=0.6)
        # Denser keyframes and no keyframe culling so the map
        # deterministically exceeds the 5-KF reset floor on every backend
        # by the time the blackout hits (CPU numerics cull more
        # aggressively on this highly redundant synthetic orbit, which
        # would flip recovery into the full-reset path instead).
        slam = make_system(cam, max_frames_between_kf=4, kf_cull_redundancy=1.1,
                           kf_ref_ratio=1.1)
        K = np.asarray(cam.K)
        blank = np.zeros((H, W), np.uint8)
        tracked_after = 0
        for i, T in enumerate(poses):
            if 30 <= i < 33:
                img = blank  # occlusion: tracking must drop to LOST
            else:
                img = scene.render(K, T, W, H)
            pose = slam.track_monocular(img, i * 0.1)
            if i >= 33 and pose is not None:
                tracked_after += 1
        assert slam.stats.n_lost >= 2
        assert tracked_after >= 7, "failed to relocalize after blackout"
        assert slam.stats.n_reloc >= 1


class TestRelocalizationHard:
    """Round-5 gate (r4 verdict missing #3): blackout + VIEWPOINT CHANGE
    away from any keyframe pose, >=3 seeds, >=2/3 staged-ladder
    successes, with stage attribution recorded (reference ladder
    src/Tracking.cc:1473-1585)."""

    @pytest.mark.slow
    def test_success_rate_with_viewpoint_change(self):
        from orb_slam_cuda_tpu.geometry import se3
        import jax.numpy as jnp

        successes = 0
        stage_stats = {}
        for seed in (3, 5, 9):
            rng = np.random.default_rng(seed)
            cam = Camera.create(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2,
                                width=W, height=H)
            scene = synthetic.PlanarScene.default(
                rng, depth=5.0, second_depth=8.0, extent=12.0, tex_size=768
            )
            poses = synthetic.orbit_trajectory(36, radius=0.6)
            slam = make_system(cam, max_frames_between_kf=4,
                               kf_cull_redundancy=1.1, kf_ref_ratio=1.1)
            K = np.asarray(cam.K)
            for i, T in enumerate(poses):
                slam.track_monocular(scene.render(K, T, W, H), i * 0.1)
            if slam.stats.n_keyframes <= 5:
                continue  # would trip the small-map full reset instead

            # Blackout, then resume from a DISPLACED viewpoint: camera
            # offset sideways+forward with an 8 deg yaw, between keyframe
            # poses rather than at one.
            blank = np.zeros((H, W), np.uint8)
            for j in range(3):
                slam.track_monocular(blank, (36 + j) * 0.1)
            yaw = np.asarray(se3.so3_exp(jnp.asarray(
                np.array([0.0, np.deg2rad(8.0), 0.0], np.float32))))
            delta = np.eye(4)
            delta[:3, :3] = yaw
            delta[:3, 3] = [0.20, 0.05, 0.12]
            tracked_after = 0
            for j in range(8):
                T = delta @ poses[18 + j]
                pose = slam.track_monocular(
                    scene.render(K, T, W, H), (40 + j) * 0.1
                )
                if pose is not None:
                    tracked_after += 1
            if slam.stats.n_reloc >= 1 and tracked_after >= 4:
                successes += 1
            for k, v in getattr(slam, "reloc_stage_stats", {}).items():
                stage_stats[k] = stage_stats.get(k, 0) + v

        print("reloc stage attribution:", stage_stats)
        assert successes >= 2, (successes, stage_stats)
        # The ladder must actually have fired (not just the 5-KF reset).
        assert sum(v for k, v in stage_stats.items() if k != "fail") >= 2
