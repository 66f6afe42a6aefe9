"""Bundle adjustment convergence tests on synthetic problems."""

import jax.numpy as jnp
import numpy as np

from orb_slam_cuda_tpu.geometry import camera, se3
from orb_slam_cuda_tpu.solvers import bundle_adjust as ba

CAM = camera.Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)


def build_problem(rng, n_cams=6, n_pts=120, noise_px=0.5, pose_noise=0.02,
                  pt_noise=0.05, outlier_frac=0.0, bf=0.0):
    cam = camera.Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=bf,
                               width=640, height=480)
    X = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(5, 10, n_pts)],
        axis=-1,
    ).astype(np.float32)
    poses_true = []
    for i in range(n_cams):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.15 * i  # lateral track
        xi[4] = 0.01 * i
        poses_true.append(np.array(se3.exp(jnp.asarray(xi))))
    poses_true = np.stack(poses_true)

    obs_cam, obs_pt, obs_uv, obs_ur = [], [], [], []
    for c in range(n_cams):
        Xc = X @ poses_true[c, :3, :3].T + poses_true[c, :3, 3]
        uvr = np.array(camera.project_stereo(cam, jnp.asarray(Xc)))
        for p in range(n_pts):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_uv.append(uvr[p, :2] + rng.normal(0, noise_px, 2))
            obs_ur.append(uvr[p, 2] + rng.normal(0, noise_px) if bf > 0 else -1.0)
    E = len(obs_cam)
    obs_uv = np.asarray(obs_uv, np.float32)
    if outlier_frac > 0:
        n_out = int(E * outlier_frac)
        sel = rng.choice(E, n_out, replace=False)
        obs_uv[sel] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))

    # Perturb initial estimates.
    poses0 = []
    for c in range(n_cams):
        noise = np.zeros(6, np.float32)
        if c > 0:
            noise = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses0.append(np.array(se3.exp(jnp.asarray(noise))) @ poses_true[c])
    X0 = X + rng.normal(0, pt_noise, X.shape).astype(np.float32)

    problem = ba.BAProblem(
        cam_pose=jnp.asarray(np.stack(poses0), jnp.float32),
        cam_fixed=jnp.asarray(np.arange(n_cams) == 0),
        xyz=jnp.asarray(X0, jnp.float32),
        pt_valid=jnp.ones((n_pts,), bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(np.asarray(obs_ur, np.float32)),
        obs_inv_sigma2=jnp.ones((E,), jnp.float32),
        obs_valid=jnp.ones((E,), bool),
    )
    return problem, poses_true, X, cam


def pose_errors(result, poses_true):
    est = np.asarray(result.cam_pose)
    errs = []
    for c in range(len(poses_true)):
        d = np.asarray(se3.log(jnp.asarray(est[c] @ np.linalg.inv(poses_true[c]))))
        errs.append(np.abs(d).max())
    return np.asarray(errs)


class TestBundleAdjust:
    def test_converges_mono(self, rng):
        problem, poses_true, X, cam = build_problem(rng)
        res = ba.bundle_adjust(problem, cam, lm_iters=12, cg_iters=25)
        errs = pose_errors(res, poses_true)
        # Mono BA has scale-gauge freedom (only cam0 fixed), so absolute
        # pose errors bottom out near the noise floor, not at zero.
        assert errs.max() < 1e-2

    def test_converges_stereo(self, rng):
        # Verified against scipy.least_squares: the true minimum of this
        # noisy problem sits at ~0.02 max pose error (0.5px noise).
        problem, poses_true, X, cam = build_problem(rng, bf=50.0)
        res = ba.bundle_adjust(problem, cam, lm_iters=12, cg_iters=25)
        errs = pose_errors(res, poses_true)
        assert errs.max() < 0.03

    def test_robust_to_outliers(self, rng):
        problem, poses_true, X, cam = build_problem(rng, outlier_frac=0.1, bf=50.0)
        res = ba.bundle_adjust(problem, cam, lm_iters=15, cg_iters=25)
        errs = pose_errors(res, poses_true)
        assert errs.max() < 0.05
        # Outliers flagged by the final chi2 gate.
        inl = np.asarray(res.obs_inlier)
        assert inl.mean() < 0.95 and inl.mean() > 0.8

    def test_fixed_camera_unchanged(self, rng):
        problem, poses_true, X, cam = build_problem(rng)
        res = ba.bundle_adjust(problem, cam, lm_iters=5, cg_iters=10)
        np.testing.assert_allclose(
            np.asarray(res.cam_pose[0]), np.asarray(problem.cam_pose[0]), atol=1e-7
        )

    def test_improves_noisy_points(self, rng):
        # Stereo (bf>0) pins the scale gauge so point errors are
        # comparable in absolute terms.
        problem, poses_true, X, cam = build_problem(rng, pt_noise=0.3, bf=50.0)
        before = np.abs(np.asarray(problem.xyz) - X).mean()
        res = ba.bundle_adjust(problem, cam, lm_iters=12, cg_iters=25)
        after = np.abs(np.asarray(res.xyz) - X).mean()
        assert after < 0.3 * before

    def test_padded_rows_inert(self, rng):
        problem, poses_true, X, cam = build_problem(rng, n_cams=4, n_pts=50)
        # Append garbage padded observations (invalid).
        pad = 64
        problem2 = problem._replace(
            obs_cam=jnp.concatenate([problem.obs_cam, jnp.full((pad,), -1, jnp.int32)]),
            obs_pt=jnp.concatenate([problem.obs_pt, jnp.full((pad,), -1, jnp.int32)]),
            obs_uv=jnp.concatenate([problem.obs_uv, jnp.full((pad, 2), 1e6, jnp.float32)]),
            obs_ur=jnp.concatenate([problem.obs_ur, jnp.full((pad,), -1.0, jnp.float32)]),
            obs_inv_sigma2=jnp.concatenate([problem.obs_inv_sigma2, jnp.ones((pad,))]),
            obs_valid=jnp.concatenate([problem.obs_valid, jnp.zeros((pad,), bool)]),
        )
        r1 = ba.bundle_adjust(problem, cam, lm_iters=6, cg_iters=15)
        r2 = ba.bundle_adjust(problem2, cam, lm_iters=6, cg_iters=15)
        np.testing.assert_allclose(
            np.asarray(r1.cam_pose), np.asarray(r2.cam_pose), atol=1e-5
        )
