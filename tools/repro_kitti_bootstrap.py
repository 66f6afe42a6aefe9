"""Fast repro of the mono_kitti bootstrap failure (round-5 diagnosis).

The full eval showed: 3 keyframes by frame 100, first tracking loss at
frame 81, small-map reset (scale split 0.058 -> 0.019), permanent loss
at lap re-entry, ATE 18.4% of extent. This driver reruns just the first
MS_FRAMES frames of the same sequence through the System with per-frame
(inliers, ref_tracked, kfs, state) so the c2 keyframe-policy dynamics
are visible directly.

Usage: JAX_PLATFORMS=cpu python tools/repro_kitti_bootstrap.py [n_frames]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 170


def main():
    from orb_slam_cuda_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from orb_slam_cuda_tpu.engine import Sensor, System, SystemConfig
    from orb_slam_cuda_tpu.geometry.camera import Camera
    from orb_slam_cuda_tpu.io.datasets import KittiOdometryDataset

    root = "/tmp/accuracy_eval_v2/mono_kitti"
    cam = Camera.create(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                        width=1241, height=376)
    cfg = SystemConfig(
        camera=cam, sensor=Sensor.MONOCULAR, n_features=2000,
        max_keyframes=256, max_points=32768,
        max_frames_between_kf=10,  # fps, the reference mMaxFrames
    )
    slam = System(cfg)
    ds = KittiOdometryDataset(root)
    prev_kfs = 0
    for i, (t, frame) in enumerate(ds):
        if i >= N:
            break
        slam.track_monocular(frame["image"], t)
        inl = getattr(slam, "n_inliers_local", -1)
        rt = getattr(slam, "ref_tracked", -1)
        kfs = slam.stats.n_keyframes
        mark = " +KF" if kfs > prev_kfs else ""
        prev_kfs = kfs
        if i % 5 == 0 or mark or slam.tracking_state.name != "OK":
            print(f"f{i:3d} t={t:5.1f} {slam.tracking_state.name:>15} "
                  f"inl={inl:4d} ref_tracked={rt:4d} "
                  f"weak={'Y' if inl < 0.9 * max(rt, 1) else 'n'} "
                  f"kfs={kfs}{mark}", flush=True)
    print(f"tracked {slam.stats.n_tracked}/{slam.stats.n_frames}; "
          f"kfs={slam.stats.n_keyframes} relocs={slam.stats.n_reloc}")


if __name__ == "__main__":
    main()
