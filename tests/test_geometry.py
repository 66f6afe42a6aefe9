"""Unit tests for SE3/Sim3 manifold ops, camera model, triangulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_cuda_tpu.geometry import camera, se3, sim3, triangulate


def random_rotation(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(se3.quat_to_rot(jnp.asarray(q, jnp.float32)))


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = rng.normal(size=(64, 3)).astype(np.float32)
        phi *= (rng.uniform(0.01, 2.5, size=(64, 1)) / np.linalg.norm(phi, axis=-1, keepdims=True)).astype(np.float32)
        R = se3.so3_exp(jnp.asarray(phi))
        phi2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(phi2), phi, atol=2e-5)

    def test_exp_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]], jnp.float32)
        R = se3.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(R)))

    def test_orthonormal(self, rng):
        phi = rng.normal(size=(16, 3)).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray(phi)))
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.8
        T = se3.exp(jnp.asarray(xi))
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)

    def test_inverse(self, rng):
        xi = rng.normal(size=(8, 6)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        TT = np.asarray(T @ se3.inverse(T))
        np.testing.assert_allclose(TT, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    def test_transform_points(self, rng):
        xi = rng.normal(size=(6,)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        X = rng.normal(size=(10, 3)).astype(np.float32)
        Y = np.asarray(se3.transform(T, jnp.asarray(X)))
        Tn = np.asarray(T)
        expect = X @ Tn[:3, :3].T + Tn[:3, 3]
        np.testing.assert_allclose(Y, expect, atol=1e-5)

    def test_quat_roundtrip(self, rng):
        R = random_rotation(rng, (32,))
        q = se3.rot_to_quat(jnp.asarray(R))
        R2 = np.asarray(se3.quat_to_rot(q))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_retract_first_order(self, rng):
        T = se3.exp(jnp.asarray(rng.normal(size=(6,)).astype(np.float32)))
        eps = jnp.asarray(rng.normal(size=(6,)).astype(np.float32)) * 1e-4
        T2 = se3.retract(T, eps)
        delta = se3.log(T2 @ se3.inverse(T))
        np.testing.assert_allclose(np.asarray(delta), np.asarray(eps), atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(16, 7)).astype(np.float32) * 0.5
        S = sim3.exp(jnp.asarray(xi))
        xi2 = sim3.log(S)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-3)

    def test_compose_inverse(self, rng):
        a = sim3.exp(jnp.asarray(rng.normal(size=(7,)).astype(np.float32) * 0.5))
        b = sim3.exp(jnp.asarray(rng.normal(size=(7,)).astype(np.float32) * 0.5))
        ab = sim3.compose(a, b)
        ident = sim3.compose(ab, sim3.inverse(ab))
        np.testing.assert_allclose(np.asarray(ident[0]), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ident[1]), np.zeros(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ident[2]), 1.0, atol=1e-5)

    def test_transform_matches_compose(self, rng):
        a = sim3.exp(jnp.asarray(rng.normal(size=(7,)).astype(np.float32) * 0.5))
        b = sim3.exp(jnp.asarray(rng.normal(size=(7,)).astype(np.float32) * 0.5))
        X = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        lhs = sim3.transform(sim3.compose(a, b), X)
        rhs = sim3.transform(a, sim3.transform(b, X))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)

    def test_zero_rotation_scale_only(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0, 0, 0, 0.3], jnp.float32)
        R, t, s = sim3.exp(xi)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(float(s), np.exp(0.3), atol=1e-6)
        # t = (s-1)/sigma * rho for pure scale
        np.testing.assert_allclose(
            np.asarray(t), (np.exp(0.3) - 1.0) / 0.3 * np.array([1.0, 2.0, 3.0]), rtol=1e-5
        )


class TestCamera:
    def cam(self):
        return camera.Camera.create(
            fx=517.3, fy=516.5, cx=318.6, cy=255.3,
            k1=0.26, k2=-0.95, p1=-0.005, p2=0.003, k3=1.16,
            width=640, height=480,
        )

    def test_project_backproject(self, rng):
        cam = self.cam()
        X = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(1.0, 5.0, size=50)
        uv = camera.project(cam, jnp.asarray(X))
        X2 = camera.backproject(cam, uv, jnp.asarray(X[:, 2]))
        np.testing.assert_allclose(np.asarray(X2), X, atol=1e-4)

    def test_undistort_inverts_distort(self, rng):
        cam = self.cam()
        X = rng.uniform(-0.3, 0.3, size=(50, 3)).astype(np.float32)
        X[:, 2] = 1.0
        uv_dist = camera.project(cam, jnp.asarray(X), distort=True)
        uv_und = camera.undistort_points(cam, uv_dist, iters=20)
        uv_ideal = camera.project(cam, jnp.asarray(X), distort=False)
        np.testing.assert_allclose(np.asarray(uv_und), np.asarray(uv_ideal), atol=0.05)

    def test_undistort_matches_opencv(self, rng):
        cv2 = pytest.importorskip("cv2")
        cam = self.cam()
        pts = rng.uniform([100, 100], [540, 380], size=(30, 2)).astype(np.float32)
        K = np.asarray(cam.K)
        D = np.array([0.26, -0.95, -0.005, 0.003, 1.16], np.float32)
        cv_out = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, D, P=K).reshape(-1, 2)
        ours = np.asarray(camera.undistort_points(cam, jnp.asarray(pts), iters=20))
        np.testing.assert_allclose(ours, cv_out, atol=0.2)

    def test_stereo_projection(self):
        cam = camera.Camera.create(fx=718.856, fy=718.856, cx=607.19, cy=185.2,
                                   bf=386.1448, width=1241, height=376)
        X = jnp.array([[1.0, 0.5, 10.0]], jnp.float32)
        uvr = camera.project_stereo(cam, X)
        disparity = float(uvr[0, 0] - uvr[0, 2])
        np.testing.assert_allclose(disparity, 386.1448 / 10.0, rtol=1e-5)


class TestTriangulation:
    def test_triangulate_exact(self, rng):
        K = jnp.asarray(camera.Camera.create(fx=500, fy=500, cx=320, cy=240).K)
        T1 = se3.exp(jnp.asarray(np.zeros(6, np.float32)))
        T2 = se3.exp(jnp.asarray(np.array([0.5, 0, 0, 0, 0.05, 0], np.float32)))
        X = rng.uniform(-1, 1, size=(40, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(4.0, 8.0, size=40)
        x1 = camera.project(camera.Camera.create(fx=500, fy=500, cx=320, cy=240), se3.transform(T1, jnp.asarray(X)))
        x2 = camera.project(camera.Camera.create(fx=500, fy=500, cx=320, cy=240), se3.transform(T2, jnp.asarray(X)))
        P1 = triangulate.projection_matrix(K, T1)
        P2 = triangulate.projection_matrix(K, T2)
        Xt = triangulate.triangulate_dlt(P1, P2, x1, x2)
        np.testing.assert_allclose(np.asarray(Xt), X, atol=1e-2)
        z1, z2, cosp = triangulate.cheirality_and_parallax(Xt, T1, T2)
        assert np.all(np.asarray(z1) > 0) and np.all(np.asarray(z2) > 0)
        assert np.all(np.asarray(cosp) < 0.99999)

    def test_epipolar_constraint(self, rng):
        cam = camera.Camera.create(fx=500, fy=500, cx=320, cy=240)
        K = jnp.asarray(cam.K)
        T1 = se3.exp(jnp.asarray(np.array([0.1, 0, 0, 0, 0, 0], np.float32)))
        T2 = se3.exp(jnp.asarray(np.array([-0.2, 0.1, 0, 0.02, -0.03, 0.01], np.float32)))
        X = rng.uniform(-1, 1, size=(30, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(3.0, 9.0, size=30)
        x1 = camera.project(cam, se3.transform(T1, jnp.asarray(X)))
        x2 = camera.project(cam, se3.transform(T2, jnp.asarray(X)))
        F12 = triangulate.fundamental_from_poses(K, T1, K, T2)
        d2 = triangulate.epipolar_distance_sq(F12, x1, x2)
        np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-3)


def test_jit_and_vmap_compose():
    """Everything must be jittable and vmappable."""
    f = jax.jit(lambda xi: se3.log(se3.exp(xi)))
    xi = jnp.ones((4, 6), jnp.float32) * 0.1
    out = jax.vmap(f)(xi[None].repeat(2, 0))
    assert out.shape == (2, 4, 6)
