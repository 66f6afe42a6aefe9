"""EPnP RANSAC tests."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_cuda_tpu.geometry import camera, se3
from orb_slam_cuda_tpu.solvers import pnp

CAM = camera.Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)


def scene(rng, m=150):
    X = np.stack(
        [rng.uniform(-3, 3, m), rng.uniform(-2, 2, m), rng.uniform(4, 10, m)], -1
    ).astype(np.float32)
    xi = np.array([0.4, -0.2, 0.3, 0.1, -0.15, 0.08], np.float32)
    T = np.asarray(se3.exp(jnp.asarray(xi)))
    uv = np.array(camera.project(CAM, se3.transform(jnp.asarray(T), jnp.asarray(X))))
    return X, T, uv


class TestEPnP:
    def test_clean_recovery(self, rng):
        X, T_true, uv = scene(rng)
        uv += rng.normal(0, 0.3, uv.shape)
        res = pnp.solve_pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
            jnp.ones(len(X), bool), jnp.full(len(X), 5.991, jnp.float32),
            CAM, jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        err = np.abs(np.asarray(se3.log(res.pose @ se3.inverse(jnp.asarray(T_true)))))
        assert err.max() < 5e-3
        assert int(res.n_inliers) > 140

    def test_with_outliers(self, rng):
        X, T_true, uv = scene(rng, 200)
        uv += rng.normal(0, 0.3, uv.shape)
        n_out = 80  # 40% outliers
        sel = rng.choice(200, n_out, replace=False)
        uv[sel] += rng.uniform(30, 150, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        res = pnp.solve_pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
            jnp.ones(len(X), bool), jnp.full(len(X), 5.991, jnp.float32),
            CAM, jax.random.PRNGKey(1),
        )
        assert bool(res.ok)
        err = np.abs(np.asarray(se3.log(res.pose @ se3.inverse(jnp.asarray(T_true)))))
        assert err.max() < 1e-2
        inl = np.asarray(res.inliers)
        assert inl[sel].sum() <= 4
        assert inl.sum() > 100

    def test_too_few_points_fails(self, rng):
        X, T_true, uv = scene(rng, 30)
        valid = np.zeros(30, bool)
        valid[:5] = True
        uv = uv + rng.uniform(50, 90, uv.shape)  # all inconsistent
        res = pnp.solve_pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
            jnp.asarray(valid), jnp.full(30, 5.991, jnp.float32),
            CAM, jax.random.PRNGKey(2), min_inliers=10,
        )
        assert not bool(res.ok)

    def test_masked_points_excluded(self, rng):
        X, T_true, uv = scene(rng, 120)
        valid = np.ones(120, bool)
        uv2 = uv.copy()
        uv2[60:] = rng.uniform(0, 640, (60, 2))  # corrupt but also masked
        valid[60:] = False
        res = pnp.solve_pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv2.astype(np.float32)),
            jnp.asarray(valid), jnp.full(120, 5.991, jnp.float32),
            CAM, jax.random.PRNGKey(3),
        )
        assert bool(res.ok)
        err = np.abs(np.asarray(se3.log(res.pose @ se3.inverse(jnp.asarray(T_true)))))
        assert err.max() < 1e-2
