"""Tests for the Sim3 RANSAC solver, OptimizeSim3 and the Sim3 pose graph."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_cuda_tpu.geometry import camera, se3, sim3
from orb_slam_cuda_tpu.solvers import pose_graph, sim3_opt, sim3_solver

CAM = camera.Camera.create(fx=400.0, fy=400.0, cx=160.0, cy=120.0, width=320, height=240)


class TestHornSim3:
    def test_exact_recovery(self, rng):
        x2 = rng.uniform(-2, 2, (30, 3)).astype(np.float32)
        xi = np.array([0.3, -0.2, 0.5, 0.2, -0.1, 0.15, 0.25], np.float32)
        R, t, s = sim3.exp(jnp.asarray(xi))
        x1 = np.asarray(sim3.transform((R, t, s), jnp.asarray(x2)))
        Re, te, se = sim3_solver.horn_sim3(jnp.asarray(x1), jnp.asarray(x2))
        np.testing.assert_allclose(np.asarray(Re), np.asarray(R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(te), np.asarray(t), atol=1e-4)
        np.testing.assert_allclose(float(se), float(s), rtol=1e-4)

    def test_fix_scale(self, rng):
        x2 = rng.uniform(-2, 2, (20, 3)).astype(np.float32)
        R_true = np.asarray(se3.so3_exp(jnp.asarray(np.array([0.1, 0.2, -0.1], np.float32))))
        x1 = x2 @ R_true.T + np.array([0.5, -0.3, 0.2], np.float32)
        Re, te, se = sim3_solver.horn_sim3(jnp.asarray(x1), jnp.asarray(x2), fix_scale=True)
        assert float(se) == 1.0
        np.testing.assert_allclose(np.asarray(Re), R_true, atol=1e-4)


class TestSim3Ransac:
    def test_with_outliers(self, rng):
        m = 100
        # Points in camera-2 frame, visible (positive z).
        x2 = np.stack([
            rng.uniform(-1.5, 1.5, m), rng.uniform(-1, 1, m), rng.uniform(3, 8, m)
        ], -1).astype(np.float32)
        xi = np.array([0.2, -0.1, 0.3, 0.05, -0.08, 0.02, 0.15], np.float32)
        S = sim3.exp(jnp.asarray(xi))
        x1 = np.array(sim3.transform(S, jnp.asarray(x2)))
        # 25% outlier correspondences.
        n_out = 25
        idx_out = rng.choice(m, n_out, replace=False)
        x1[idx_out] += rng.uniform(0.5, 2.0, (n_out, 3))
        uv1 = np.array(camera.project(CAM, jnp.asarray(
            sim3.transform(S, jnp.asarray(x2)))))
        uv2 = np.array(camera.project(CAM, jnp.asarray(x2)))
        th = np.full(m, 9.21, np.float32)
        res = sim3_solver.solve_sim3_ransac(
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(m, bool), CAM, jax.random.PRNGKey(0),
            jnp.asarray(th), jnp.asarray(th),
        )
        assert bool(res.ok)
        R_t, t_t, s_t = [np.asarray(v) for v in sim3.exp(jnp.asarray(xi))]
        np.testing.assert_allclose(np.asarray(res.R), R_t, atol=5e-3)
        np.testing.assert_allclose(float(res.s), float(s_t), rtol=5e-3)
        inl = np.asarray(res.inliers)
        assert inl[idx_out].sum() <= 2
        assert inl.sum() >= 70


class TestOptimizeSim3:
    """OptimizeSim3 (reference src/Optimizer.cc:1190-1417): joint Sim3
    refinement over bidirectional reprojection edges with chi2 outlier
    reclassification."""

    def _make_problem(self, rng, m=60, n_out=0):
        # Points in KF2 camera frame; KF1 sees them through a true Sim3.
        x2c = np.stack([
            rng.uniform(-1.5, 1.5, m), rng.uniform(-1, 1, m),
            rng.uniform(3, 8, m),
        ], -1).astype(np.float32)
        xi = np.array([0.2, -0.1, 0.3, 0.05, -0.08, 0.02, 0.12], np.float32)
        S_true = sim3.exp(jnp.asarray(xi))
        x1c = np.asarray(sim3.transform(S_true, jnp.asarray(x2c)))
        uv1 = np.array(camera.project(CAM, jnp.asarray(x1c)))
        uv2 = np.array(camera.project(CAM, jnp.asarray(x2c)))
        out_idx = rng.choice(m, n_out, replace=False) if n_out else np.array([], int)
        uv1[out_idx] += rng.uniform(20, 60, (n_out, 2))
        isig = np.ones(m, np.float32)
        return S_true, x1c, x2c, uv1, uv2, isig, out_idx

    def test_refines_perturbed_estimate(self, rng):
        S_true, x1c, x2c, uv1, uv2, isig, _ = self._make_problem(rng)
        # Perturb the initial estimate.
        dxi = np.array([0.05, -0.04, 0.06, 0.02, -0.015, 0.01, 0.03], np.float32)
        S0 = sim3.compose(sim3.exp(jnp.asarray(dxi)), S_true)
        res = sim3_opt.optimize_sim3(
            S0, jnp.asarray(x1c), jnp.asarray(x2c),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(isig), jnp.asarray(isig),
            jnp.ones(len(x1c), bool), CAM,
        )
        assert int(res.n_inliers) == len(x1c)
        R_t, t_t, s_t = [np.asarray(v) for v in S_true]
        np.testing.assert_allclose(np.asarray(res.R), R_t, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_t, atol=1e-2)
        np.testing.assert_allclose(float(res.s), float(s_t), rtol=1e-3)

    def test_reclassifies_outliers(self, rng):
        S_true, x1c, x2c, uv1, uv2, isig, out_idx = self._make_problem(
            rng, m=80, n_out=20
        )
        res = sim3_opt.optimize_sim3(
            S_true, jnp.asarray(x1c), jnp.asarray(x2c),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(isig), jnp.asarray(isig),
            jnp.ones(len(x1c), bool), CAM,
        )
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any()
        assert int(res.n_inliers) == 60
        np.testing.assert_allclose(
            float(res.s), float(np.asarray(S_true[2])), rtol=5e-3
        )

    def test_fix_scale_pins_scale(self, rng):
        S_true, x1c, x2c, uv1, uv2, isig, _ = self._make_problem(rng)
        # Start from a wrong scale with fix_scale: scale must stay put.
        R0, t0, s0 = S_true
        S0 = (R0, t0, jnp.float32(1.0))
        res = sim3_opt.optimize_sim3(
            S0, jnp.asarray(x1c), jnp.asarray(x2c),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(isig), jnp.asarray(isig),
            jnp.ones(len(x1c), bool), CAM, fix_scale=True,
        )
        assert abs(float(res.s) - 1.0) < 1e-6

    def test_under_ten_survivors_fails(self, rng):
        # Reference: fewer than 10 surviving correspondences -> return 0
        # (src/Optimizer.cc:1360-1361).
        S_true, x1c, x2c, uv1, uv2, isig, out_idx = self._make_problem(
            rng, m=20, n_out=15
        )
        res = sim3_opt.optimize_sim3(
            S_true, jnp.asarray(x1c), jnp.asarray(x2c),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(isig), jnp.asarray(isig),
            jnp.ones(len(x1c), bool), CAM,
        )
        assert int(res.n_inliers) == 0


def ring_problem(rng, n=12, drift_scale=0.01):
    """Ring of keyframes with odometry edges + one loop edge; odometry
    accumulates drift, the loop edge closes it — the classic pose-graph
    test (the scenario CorrectLoop feeds OptimizeEssentialGraph)."""
    true = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        xi = np.array([np.cos(ang), np.sin(ang), 0, 0, 0, ang, 0.0], np.float32)
        # Build as Sim3 with s=1: rotation about z by ang, translation.
        true.append(sim3.exp(jnp.asarray(xi)))
    # Odometry measurements: exact relative sim3 between consecutive.
    edges = []
    for k in range(n - 1):
        Sji = pose_graph.relative_sim3(true[k], true[k + 1])
        edges.append((k, k + 1, Sji))
    # Loop edge n-1 -> 0 (exact).
    edges.append((n - 1, 0, pose_graph.relative_sim3(true[n - 1], true[0])))

    # Drifted initial estimates: accumulate odometry with noise.
    est = [true[0]]
    for k in range(1, n):
        Sji = pose_graph.relative_sim3(true[k - 1], true[k])
        noise = rng.normal(0, drift_scale, 7).astype(np.float32)
        noise[6] = rng.normal(0, drift_scale)  # scale drift too
        Sji_n = sim3.compose(sim3.exp(jnp.asarray(noise)), Sji)
        est.append(sim3.compose(Sji_n, est[-1]))
    return true, est, edges


class TestPoseGraph:
    def test_closes_drifted_ring(self, rng):
        true, est, edges = ring_problem(rng, n=12, drift_scale=0.02)
        K = len(true)
        E = len(edges)
        R0 = jnp.stack([e[0] for e in est])
        t0 = jnp.stack([e[1] for e in est])
        s0 = jnp.stack([e[2] for e in est])
        problem = pose_graph.PoseGraphProblem(
            vert_R=R0, vert_t=t0, vert_s=s0,
            vert_fixed=jnp.asarray(np.arange(K) == 0),
            edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
            edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
            meas_R=jnp.stack([e[2][0] for e in edges]),
            meas_t=jnp.stack([e[2][1] for e in edges]),
            meas_s=jnp.stack([e[2][2] for e in edges]),
            edge_valid=jnp.ones((E,), bool),
        )
        drift_before = float(jnp.linalg.norm(est[-1][1] - true[-1][1]))
        R, t, s = pose_graph.optimize_pose_graph(problem, gn_iters=15, cg_iters=30)
        # All residuals should be ~0 (consistent measurements).
        err_t = np.abs(np.asarray(t) - np.stack([np.asarray(x[1]) for x in true]))
        err_s = np.abs(np.asarray(s) - 1.0)
        assert err_t.max() < 0.05, f"translation errors {err_t.max()} (drift was {drift_before})"
        assert err_s.max() < 0.02

    def test_fixed_vertex_stays(self, rng):
        true, est, edges = ring_problem(rng, n=8)
        K = len(true)
        problem = pose_graph.PoseGraphProblem(
            vert_R=jnp.stack([e[0] for e in est]),
            vert_t=jnp.stack([e[1] for e in est]),
            vert_s=jnp.stack([e[2] for e in est]),
            vert_fixed=jnp.asarray(np.arange(K) == 0),
            edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
            edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
            meas_R=jnp.stack([e[2][0] for e in edges]),
            meas_t=jnp.stack([e[2][1] for e in edges]),
            meas_s=jnp.stack([e[2][2] for e in edges]),
            edge_valid=jnp.ones((len(edges),), bool),
        )
        R, t, s = pose_graph.optimize_pose_graph(problem, gn_iters=5, cg_iters=20)
        np.testing.assert_allclose(np.asarray(t[0]), np.asarray(est[0][1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s[0]), 1.0, atol=1e-6)
