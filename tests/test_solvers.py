"""Tests for pose-only LM and two-view initialization."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_cuda_tpu.geometry import camera, se3
from orb_slam_cuda_tpu.solvers import initializer, pose_opt

CAM = camera.Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)


def make_scene(rng, m=200, depth=(4.0, 10.0)):
    X = np.stack(
        [
            rng.uniform(-3, 3, m),
            rng.uniform(-2, 2, m),
            rng.uniform(*depth, m),
        ],
        axis=-1,
    ).astype(np.float32)
    return X


class TestPoseOptimization:
    def test_recovers_pose(self, rng):
        X = make_scene(rng)
        xi_true = np.array([0.1, -0.05, 0.08, 0.03, -0.02, 0.01], np.float32)
        T_true = se3.exp(jnp.asarray(xi_true))
        uv = camera.project(CAM, se3.transform(T_true, jnp.asarray(X)))
        uv = uv + jnp.asarray(rng.normal(0, 0.3, uv.shape).astype(np.float32))
        T0 = jnp.eye(4)
        res = pose_opt.optimize_pose(
            T0, jnp.asarray(X), uv, jnp.full((len(X),), -1.0),
            jnp.ones((len(X),), jnp.float32), jnp.ones((len(X),), bool), CAM,
        )
        err = np.asarray(se3.log(res.pose @ se3.inverse(T_true)))
        assert np.abs(err).max() < 5e-3
        assert int(res.n_inliers) > 190

    def test_rejects_outliers(self, rng):
        X = make_scene(rng, 300)
        xi_true = np.array([0.05, 0.02, -0.03, 0.01, 0.02, -0.01], np.float32)
        T_true = se3.exp(jnp.asarray(xi_true))
        uv = np.array(camera.project(CAM, se3.transform(T_true, jnp.asarray(X))))
        uv += rng.normal(0, 0.3, uv.shape)
        # 20% gross outliers.
        n_out = 60
        out_idx = rng.choice(300, n_out, replace=False)
        uv[out_idx] += rng.uniform(30, 100, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        res = pose_opt.optimize_pose(
            jnp.eye(4), jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
            jnp.full((300,), -1.0), jnp.ones((300,), jnp.float32),
            jnp.ones((300,), bool), CAM,
        )
        err = np.asarray(se3.log(res.pose @ se3.inverse(T_true)))
        assert np.abs(err).max() < 1e-2
        inl = np.asarray(res.inliers)
        assert inl[out_idx].sum() <= 3  # outliers flagged
        assert inl.sum() > 200

    def test_stereo_edges(self, rng):
        cam_st = camera.Camera.create(
            fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0, width=640, height=480
        )
        X = make_scene(rng)
        xi_true = np.array([0.1, 0.0, 0.05, 0.0, 0.02, 0.0], np.float32)
        T_true = se3.exp(jnp.asarray(xi_true))
        uvr = np.array(camera.project_stereo(cam_st, se3.transform(T_true, jnp.asarray(X))))
        res = pose_opt.optimize_pose(
            jnp.eye(4), jnp.asarray(X), jnp.asarray(uvr[:, :2]),
            jnp.asarray(uvr[:, 2]), jnp.ones((len(X),), jnp.float32),
            jnp.ones((len(X),), bool), cam_st,
        )
        err = np.asarray(se3.log(res.pose @ se3.inverse(T_true)))
        assert np.abs(err).max() < 1e-3

    def test_masked_points_ignored(self, rng):
        X = make_scene(rng, 100)
        T_true = se3.exp(jnp.asarray(np.array([0.05, 0, 0, 0, 0, 0], np.float32)))
        uv = np.array(camera.project(CAM, se3.transform(T_true, jnp.asarray(X))))
        # Corrupt half the points but mask them out.
        uv[50:] += 500.0
        valid = np.zeros(100, bool)
        valid[:50] = True
        res = pose_opt.optimize_pose(
            jnp.eye(4), jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
            jnp.full((100,), -1.0), jnp.ones((100,), jnp.float32),
            jnp.asarray(valid), CAM,
        )
        err = np.asarray(se3.log(res.pose @ se3.inverse(T_true)))
        assert np.abs(err).max() < 1e-3


class TestInitializer:
    def _run(self, rng, planar=False, noise=0.3):
        m = 200
        if planar:
            X = make_scene(rng, m, depth=(6.0, 6.0))
            X[:, 2] = 6.0 + 0.3 * X[:, 0] * 0  # exact plane
        else:
            X = make_scene(rng, m)
        T2 = se3.exp(jnp.asarray(np.array([0.3, 0.02, 0.05, 0.01, -0.04, 0.01], np.float32)))
        x1 = np.array(camera.project(CAM, jnp.asarray(X)))
        x2 = np.array(camera.project(CAM, se3.transform(T2, jnp.asarray(X))))
        x1 += rng.normal(0, noise, x1.shape)
        x2 += rng.normal(0, noise, x2.shape)
        res = initializer.initialize_two_view(
            jnp.asarray(x1.astype(np.float32)), jnp.asarray(x2.astype(np.float32)),
            jnp.ones((m,), bool), jnp.asarray(CAM.K),
            jax.random.PRNGKey(0),
        )
        return res, np.asarray(T2), X

    def test_general_scene(self, rng):
        res, T2, X = self._run(rng, planar=False)
        assert bool(res.success)
        R_est = np.asarray(res.R)
        t_est = np.asarray(res.t)
        np.testing.assert_allclose(R_est, T2[:3, :3], atol=0.01)
        t_true = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
        np.testing.assert_allclose(t_est, t_true, atol=0.02)
        # Triangulated structure correct up to global scale.
        good = np.asarray(res.is_point)
        assert good.sum() > 100
        Xe = np.asarray(res.points)[good]
        scale = np.median(X[good][:, 2] / Xe[:, 2])
        err = np.abs(Xe * scale - X[good])
        assert np.median(err) < 0.05
        assert np.quantile(err, 0.95) < 0.5  # far points are noise-limited

    def test_planar_scene_uses_homography(self, rng):
        res, T2, X = self._run(rng, planar=True)
        assert bool(res.used_homography)
        if bool(res.success):
            np.testing.assert_allclose(np.asarray(res.R), T2[:3, :3], atol=0.02)

    def test_pure_rotation_rejected(self, rng):
        m = 150
        X = make_scene(rng, m)
        T2 = se3.exp(jnp.asarray(np.array([0, 0, 0, 0.02, -0.05, 0.01], np.float32)))
        x1 = np.array(camera.project(CAM, jnp.asarray(X)))
        x2 = np.array(camera.project(CAM, se3.transform(T2, jnp.asarray(X))))
        res = initializer.initialize_two_view(
            jnp.asarray(x1.astype(np.float32)), jnp.asarray(x2.astype(np.float32)),
            jnp.ones((m,), bool), jnp.asarray(CAM.K), jax.random.PRNGKey(1),
        )
        assert not bool(res.success)  # no parallax -> must not initialize
