"""Compare sync vs pipelined tracking on the e2e orbit scene."""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, ".")
import numpy as np
from orb_slam_cuda_tpu.engine import Sensor, System, SystemConfig
from orb_slam_cuda_tpu.geometry.camera import Camera
from orb_slam_cuda_tpu.utils import synthetic
from orb_slam_cuda_tpu.utils.evaluation import ate_rmse, camera_centers

W, H = 320, 240
rng = np.random.default_rng(42)
cam = Camera.create(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, width=W, height=H)
scene = synthetic.PlanarScene.default(rng, depth=5.0, second_depth=8.0, extent=12.0, tex_size=768)
poses = synthetic.orbit_trajectory(40, radius=0.6)
K = np.asarray(cam.K)
frames = [scene.render(K, T, W, H) for T in poses]
gt_centers = [np.linalg.inv(T)[:3, 3] for T in poses]


def run(lag):
    slam = System(SystemConfig(
        camera=cam, sensor=Sensor.MONOCULAR, n_features=600,
        max_keyframes=64, max_points=8192, enable_loop_closing=False,
        max_frames_between_kf=10, pipeline_lag=lag,
    ))
    # instrument: log retired scalars + KF events
    orig_retire = slam._retire_one
    def retire():
        if slam._pending:
            fid = slam._pending[0][0]
            vec = np.asarray(slam._pending[0][3].host_vec)
            print(f"  [lag{lag}] retire fid={fid} ok={int(vec[0])} n_inl={int(vec[1])} ref_kf={int(vec[2])} ref_tracked={int(vec[3])} n_m1={int(vec[4])} n_i1={int(vec[5])} fb={int(vec[6])}")
        return orig_retire()
    slam._retire_one = retire
    orig_ck = slam._create_keyframe
    def ck(frame):
        print(f"  [lag{lag}] CREATE KF at frame_id={slam.frame_id} fsk={slam.frames_since_kf} n_inl={slam.n_inliers_local} ref_tracked={getattr(slam,'ref_tracked',None)}")
        return orig_ck(frame)
    slam._create_keyframe = ck
    for i, img in enumerate(frames):
        slam.track_monocular(img, i * 0.1)
        if lag == 0 and slam.tracking_state.name == "OK":
            print(f"  [lag0] frame {i} n_inl={getattr(slam,'n_inliers_local',-1)} ref_tracked={getattr(slam,'ref_tracked',-1)} kfs={slam.stats.n_keyframes}")
        if lag > 0 and slam._carry is not None:
            c = slam._carry
            nmp = int((np.asarray(c.mp) >= 0).sum())
            pose = np.asarray(c.pose)
            vel = np.asarray(c.vel)
            gt_T = poses[i]
            # carry.pose is pose of frame i (just dispatched)
            center_err = float(np.linalg.norm(np.linalg.inv(pose)[:3, 3] - np.linalg.inv(gt_T)[:3, 3]))
            vel_t = float(np.linalg.norm(vel[:3, 3]))
            print(f"  [lag{lag}] disp {i}: carry nmp={nmp} center_err={center_err:.3f} |vel_t|={vel_t:.4f} det={np.linalg.det(pose[:3,:3]):.4f}")
    ts, est = camera_centers(slam.get_trajectory())
    gt = np.asarray([gt_centers[int(round(t / 0.1))] for t in ts])
    ate = ate_rmse(est, gt)
    # per-frame raw error (unaligned, relative)
    errs = {round(t, 2): float(np.linalg.norm(e - g)) for t, e, g in zip(ts, est, gt)}
    print(f"lag={lag}: ATE={ate:.4f} kfs={slam.stats.n_keyframes} tracked={slam.stats.n_tracked}/{slam.stats.n_frames} lost={slam.stats.n_lost}")
    return ate, errs, slam


a0, e0, s0 = run(0)
a2, e2, s2 = run(2)
print("\nper-frame |est-gt| (unaligned) sync vs lag2:")
for t in sorted(set(e0) | set(e2)):
    print(f"  t={t:5.2f}  sync={e0.get(t, float('nan')):.4f}  lag2={e2.get(t, float('nan')):.4f}")
print("kf_order sync:", s0.kf_order)
print("kf_order lag2:", s2.kf_order)
