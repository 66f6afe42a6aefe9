"""Distributed BA tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_cuda_tpu.parallel import distributed_bundle_adjust, make_mesh
from orb_slam_cuda_tpu.solvers import bundle_adjust as ba

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
from test_bundle_adjust import build_problem, pose_errors  # noqa: E402


class TestDistributedBA:
    def test_matches_single_device(self, rng):
        problem, poses_true, X, cam = build_problem(rng, n_cams=5, n_pts=80, bf=50.0)
        single = ba.bundle_adjust(problem, cam, lm_iters=8, cg_iters=15)
        mesh = make_mesh(8)
        dist = distributed_bundle_adjust(problem, cam, mesh, lm_iters=8, cg_iters=15)
        np.testing.assert_allclose(
            np.asarray(dist.cam_pose), np.asarray(single.cam_pose), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(dist.xyz), np.asarray(single.xyz), atol=2e-3
        )
        np.testing.assert_array_equal(
            np.asarray(dist.obs_inlier), np.asarray(single.obs_inlier)
        )

    def test_converges_on_mesh(self, rng):
        problem, poses_true, X, cam = build_problem(rng, bf=50.0)
        mesh = make_mesh(8)
        res = distributed_bundle_adjust(problem, cam, mesh, lm_iters=12, cg_iters=25)
        errs = pose_errors(res, poses_true)
        assert errs.max() < 0.03

    def test_uneven_edges_padded(self, rng):
        # 6*120=720 obs not divisible by 8 after dropping some.
        problem, poses_true, X, cam = build_problem(rng, n_cams=5, n_pts=77, bf=50.0)
        assert problem.obs_cam.shape[0] % 8 != 0
        mesh = make_mesh(8)
        res = distributed_bundle_adjust(problem, cam, mesh, lm_iters=6, cg_iters=15)
        assert res.obs_inlier.shape[0] == problem.obs_cam.shape[0]
        errs = pose_errors(res, poses_true)
        assert errs.max() < 0.05

    def test_mesh_partitions_points_and_edges(self, rng):
        from orb_slam_cuda_tpu.parallel.dist_ba import partition_problem

        problem, _, _, cam = build_problem(rng, n_cams=4, n_pts=64, bf=50.0)
        mesh = make_mesh(8)
        part = partition_problem(problem, mesh)
        # Point + observation arrays sharded over 8 devices; camera state
        # replicated.
        assert len(part.local.obs_uv.sharding.device_set) == 8
        assert not part.local.obs_uv.sharding.is_fully_replicated
        assert not part.local.xyz.sharding.is_fully_replicated
        assert part.local.cam_pose.sharding.is_fully_replicated
        # Every observation was routed to the block owning its point:
        # block-local point index within [0, pblk).
        obs_pt = np.asarray(part.local.obs_pt)
        valid = np.asarray(part.local.obs_valid)
        assert (obs_pt[valid] >= 0).all() and (obs_pt[valid] < part.pblk).all()
        # Round-trip of the permutation covers every original edge once.
        src = np.asarray(part.obs_src)
        assert sorted(src[src >= 0].tolist()) == list(range(part.n_obs))


class TestMultihost:
    def test_covisibility_clusters(self, rng):
        from orb_slam_cuda_tpu.parallel.multihost import covisibility_clusters

        K = 16
        covis = np.zeros((K, K), np.int32)
        # Two covisibility blobs: 0-7 and 8-15.
        for a in range(8):
            for b in range(8):
                if a != b:
                    covis[a, b] = 50
                    covis[8 + a, 8 + b] = 50
        valid = np.ones(K, bool)
        assign = covisibility_clusters(covis, valid, 2)
        assert set(assign.tolist()) <= {0, 1}
        # Each blob should be (mostly) one cluster.
        first = assign[:8]
        second = assign[8:]
        assert (first == first[0]).mean() >= 0.75
        assert (second == second[0]).mean() >= 0.75
        assert first[0] != second[0] or len(set(assign)) == 2

    def test_initialize_noop_single_process(self):
        from orb_slam_cuda_tpu.parallel.multihost import initialize_distributed

        assert initialize_distributed() is False


class TestClusterBlockBA:
    """Cluster-parallel map refinement (parallel/cluster_ba.py): the
    covisibility partition becomes per-device local-BA blocks."""

    def _noisy_ring(self, rng):
        sys.path.insert(0, os.path.dirname(__file__))
        from test_loop_closing import CAM, CFG, build_drifted_ring

        st, db, T_true, T_est, vocab = build_drifted_ring(rng, drift=0.0)
        # The fixture is self-consistent (zero reprojection error at its
        # stored poses/points); perturb both so BA has work to do.
        K = st.kf_pose.shape[0]
        noise_p = jnp.asarray(
            rng.normal(0, 0.004, (st.mp_xyz.shape[0], 3)).astype(np.float32)
        )
        st_noisy = st._replace(
            mp_xyz=jnp.where(st.mp_valid[:, None], st.mp_xyz + noise_p, st.mp_xyz),
        )
        return st_noisy, CAM, CFG

    @staticmethod
    def reproj_rmse(state, cam):
        from orb_slam_cuda_tpu.geometry import camera as cam_mod, se3

        kf_mp = np.asarray(state.kf_mp)
        errs = []
        for k in np.flatnonzero(np.asarray(state.kf_valid)):
            row = kf_mp[k]
            sel = row >= 0
            if not sel.any():
                continue
            X = np.asarray(state.mp_xyz)[row[sel]]
            Xc = X @ np.asarray(state.kf_pose[k])[:3, :3].T + np.asarray(state.kf_pose[k])[:3, 3]
            z = np.maximum(Xc[:, 2], 1e-6)
            u = float(cam.fx) * Xc[:, 0] / z + float(cam.cx)
            v = float(cam.fy) * Xc[:, 1] / z + float(cam.cy)
            uv = np.asarray(state.kf_uv[k])[sel]
            errs.append(((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2))
        e = np.concatenate(errs)
        return float(np.sqrt(e.mean()))

    def test_reduces_reprojection_error(self, rng):
        from orb_slam_cuda_tpu.parallel.cluster_ba import cluster_block_ba

        st, cam, cfg = self._noisy_ring(rng)
        before = self.reproj_rmse(st, cam)
        inv_sig2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)
        st2 = cluster_block_ba(
            st, cam, inv_sig2, mesh=None, n_clusters=4, rounds=2,
            cams_per=12, pts_per=1024,
        )
        after = self.reproj_rmse(st2, cam)
        assert after < 0.5 * before, f"before {before:.3f} after {after:.3f}"

    def test_mesh_matches_unsharded(self, rng):
        from orb_slam_cuda_tpu.parallel.cluster_ba import cluster_block_ba

        st, cam, cfg = self._noisy_ring(rng)
        inv_sig2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)
        kw = dict(n_clusters=8, rounds=1, cams_per=8, pts_per=1024)
        st_plain = cluster_block_ba(st, cam, inv_sig2, mesh=None, **kw)
        st_mesh = cluster_block_ba(st, cam, inv_sig2, mesh=make_mesh(8), **kw)
        np.testing.assert_allclose(
            np.asarray(st_mesh.kf_pose), np.asarray(st_plain.kf_pose), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(st_mesh.mp_xyz), np.asarray(st_plain.mp_xyz), atol=1e-3
        )
