"""Bundle adjustment: Levenberg-Marquardt with preconditioned conjugate
gradients over batched residual/Jacobian blocks.

TPU-native replacement for BOTH reference back-ends:
  * g2o's `Optimizer::BundleAdjustment` / `LocalBundleAdjustment`
    (reference: src/Optimizer.cc:95-332, 545-926 — sparse Cholesky
    block-solver, 5+10 LM iterations, Huber sqrt(5.991)/sqrt(7.815),
    outlier purge after optimization);
  * PBA's CUDA Schur-complement-free PCG (`SparseBundleCU`
    Thirdparty/pba/src/pba/SparseBundleCU.cpp:1320-1588
    SolveNormalEquationPCGX/PCGB, block-Jacobi preconditioner
    ComputeBlockPC :1258-1292, JtE/JX kernels ProgramCU.cu:1316-2556).

The design follows PBA's (matrix-free normal equations), which is the
natural TPU formulation: an iteration is a handful of (E,·) batched
einsums + segment-sums (VPU) — no sparse factorization. The reference's
per-observation CUDA kernels (jacobian_frt, jte_cam/point, multiply_jx)
map 1:1 onto the einsum/segment_sum pairs here, but XLA fuses them.

Fixed-gauge handling: `cam_fixed` cameras get zero updates (the
reference fixes frontier keyframes in local BA, src/Optimizer.cc:612-637,
and keyframe 0 globally, :147).

Distribution (parallel/dist_ba.py): points are partitioned into
contiguous blocks, one per device, and every observation travels with
its point's block, so the E and P axes are both device-local under
`shard_map`. Passing `axis_name` makes the camera-sized reductions and
the point terms of the CG dot products `psum` across the mesh — O(C)
wire traffic per iteration, nothing point- or observation-sized.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem. C cameras, P points, E observations.

    obs_cam/obs_pt: (E,) int32 indices (-1-padded rows must have
    obs_valid False). obs_uv: (E,2); obs_ur: (E,) right-u (<0 mono);
    obs_inv_sigma2: (E,) information weight.
    """

    cam_pose: jnp.ndarray  # (C,4,4)
    cam_fixed: jnp.ndarray  # (C,) bool
    xyz: jnp.ndarray  # (P,3)
    pt_valid: jnp.ndarray  # (P,) bool
    obs_cam: jnp.ndarray
    obs_pt: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_ur: jnp.ndarray
    obs_inv_sigma2: jnp.ndarray
    obs_valid: jnp.ndarray


class BAResult(NamedTuple):
    cam_pose: jnp.ndarray
    xyz: jnp.ndarray
    obs_inlier: jnp.ndarray  # (E,) bool post-optimization chi2 gate
    final_error: jnp.ndarray


def _residuals_jacobians(problem: BAProblem, cam_pose, xyz, cam: Camera):
    """Per-observation residual (E,3) and Jacobians wrt camera tangent
    (E,3,6) and point position (E,3,3)."""
    ci = jnp.clip(problem.obs_cam, 0)
    pi = jnp.clip(problem.obs_pt, 0)
    T = cam_pose[ci]  # (E,4,4)
    X = xyz[pi]  # (E,3)
    Xc = jnp.einsum("eij,ej->ei", T[:, :3, :3], X) + T[:, :3, 3]
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    u_r = u - cam.bf * iz
    is_stereo = problem.obs_ur >= 0
    ur_obs = jnp.where(is_stereo, problem.obs_ur, 0.0)
    r = jnp.stack(
        [u - problem.obs_uv[:, 0], v - problem.obs_uv[:, 1], u_r - ur_obs],
        axis=-1,
    )
    du = jnp.stack([cam.fx * iz, jnp.zeros_like(iz), -cam.fx * x * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(iz), cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    dur = du + jnp.stack(
        [jnp.zeros_like(iz), jnp.zeros_like(iz), cam.bf * iz2], axis=-1
    )
    dpi = jnp.stack([du, dv, dur], axis=-2)  # (E,3,3) d(uv,ur)/dXc
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))
    dXc_dxi = jnp.concatenate([eye, -se3.hat(Xc)], axis=-1)  # (E,3,6)
    Jc = dpi @ dXc_dxi  # (E,3,6)
    Jp = dpi @ T[:, :3, :3]  # (E,3,3) dXc/dXw = R
    depth_ok = z > 1e-6
    return r, Jc, Jp, depth_ok, is_stereo


def _chi2(r, inv_sigma2, is_stereo):
    sq = r[:, 0] ** 2 + r[:, 1] ** 2 + jnp.where(is_stereo, r[:, 2] ** 2, 0.0)
    return sq * inv_sigma2


def _robust_weight(chi2, is_stereo, robust):
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    d = jnp.sqrt(delta2)
    return jnp.where(robust & (e > d), d / e, 1.0)


def bundle_adjust_impl(
    problem: BAProblem,
    cam: Camera,
    lm_iters: int = 10,
    cg_iters: int = 20,
    robust: bool = True,
    chi2_outlier_mono: float = CHI2_MONO,
    chi2_outlier_stereo: float = CHI2_STEREO,
    axis_name: str | None = None,
) -> BAResult:
    """Core LM+PCG solve. With `axis_name` set the function runs as the
    per-device body of a `shard_map` whose shards hold (a) a block of the
    point axis and (b) ALL observations of those points (the contract
    parallel/dist_ba.py's partitioner establishes). Point-side work is
    then fully device-local; only camera-sized reductions (b_c, H_cc,
    matvec y_c), the point terms of CG dot products, and the total error
    cross devices as `psum` over `axis_name` — the per-iteration wire
    traffic is O(C) + scalars, independent of points/observations."""
    psum = (
        (lambda x: jax.lax.psum(x, axis_name))
        if axis_name is not None
        else (lambda x: x)
    )
    C = problem.cam_pose.shape[0]
    P = problem.xyz.shape[0]
    E = problem.obs_cam.shape[0]
    ci = jnp.clip(problem.obs_cam, 0)
    pi = jnp.clip(problem.obs_pt, 0)
    # Freeze under-constrained variables: a point's 3 DOF need >=3
    # residual dimensions (two mono observations, or one stereo — the
    # reference culls <2-obs mono points outright, src/LocalMapping.cc:
    # 197-235 / MapPoint::SetBadFlag); a camera with no observations has
    # no business moving. Optimizing them anyway lets CG push them
    # arbitrarily (their normal-equation block is ~zero) — the runaway
    # ends in float32 overflow.
    ov = problem.obs_valid.astype(jnp.int32)
    nres = ov * jnp.where(problem.obs_ur >= 0, 3, 2)
    nobs_cam = psum(jnp.zeros((C,), jnp.int32).at[ci].add(ov))
    nres_pt = jnp.zeros((P,), jnp.int32).at[pi].add(nres)
    cam_free = ~problem.cam_fixed & (nobs_cam > 0)
    pt_free = problem.pt_valid & (nres_pt >= 3)
    # Absolute damping floor: relative damping lam*diag(H) vanishes for
    # weakly-observed blocks (diag ~ w_rob * J^2 -> 0 as a robustly
    # downweighted point recedes: J ~ 1/z), which makes the runaway
    # SELF-REINFORCING — each step doubles the distance. The floor is
    # negligible against well-constrained diagonals (~1e3..1e7) but
    # breaks the feedback loop.
    ABS_DAMP = 1e-3

    def build_system(cam_pose, xyz):
        r, Jc, Jp, depth_ok, is_stereo = _residuals_jacobians(problem, cam_pose, xyz, cam)
        use = problem.obs_valid & depth_ok
        comp = jnp.stack([use, use, use & is_stereo], axis=-1).astype(r.dtype)
        chi2 = _chi2(r, problem.obs_inv_sigma2, is_stereo)
        w_rob = _robust_weight(chi2, is_stereo, robust)
        w = problem.obs_inv_sigma2 * w_rob * use  # (E,)
        rw = r * comp
        Jcw = Jc * comp[..., None]
        Jpw = Jp * comp[..., None]
        err = psum(jnp.sum(jnp.where(use, chi2 * w_rob, 0.0)))
        return r, rw, Jcw, Jpw, w, err, is_stereo, use

    def lm_step(carry, _):
        cam_pose, xyz, lam = carry
        _, rw, Jcw, Jpw, w, err, _, _ = build_system(cam_pose, xyz)

        # Gradient b = J^T W r. Camera blocks gather contributions from
        # every device's edges (psum); point blocks are device-local.
        bc = psum(jnp.zeros((C, 6)).at[ci].add(jnp.einsum("eki,ek,e->ei", Jcw, rw, w)))
        bp = jnp.zeros((P, 3)).at[pi].add(jnp.einsum("eki,ek,e->ei", Jpw, rw, w))

        # Block-diagonal of H for damping + preconditioner.
        Hcc = psum(
            jnp.zeros((C, 6, 6)).at[ci].add(jnp.einsum("eki,ekj,e->eij", Jcw, Jcw, w))
        )
        Hpp = jnp.zeros((P, 3, 3)).at[pi].add(jnp.einsum("eki,ekj,e->eij", Jpw, Jpw, w))
        dc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
        dp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
        # Blockwise LM damping: H + lam * diag(H) + absolute floor.
        lam_dc = lam * jnp.maximum(dc, 1e-6) + ABS_DAMP  # (C,6) diag terms
        lam_dp = lam * jnp.maximum(dp, 1e-6) + ABS_DAMP
        Hcc_d = Hcc + lam_dc[:, :, None] * jnp.eye(6)[None]
        Hpp_d = Hpp + lam_dp[:, :, None] * jnp.eye(3)[None]
        Minv_c = jnp.linalg.inv(Hcc_d + 1e-8 * jnp.eye(6)[None])
        Minv_p = jnp.linalg.inv(Hpp_d + 1e-8 * jnp.eye(3)[None])
        Minv_c = jnp.where(cam_free[:, None, None], Minv_c, 0.0)
        Minv_p = jnp.where(pt_free[:, None, None], Minv_p, 0.0)

        def matvec(xc, xp):
            """(H + lam D) x restricted to free variables."""
            xc = jnp.where(cam_free[:, None], xc, 0.0)
            xp = jnp.where(pt_free[:, None], xp, 0.0)
            ye = jnp.einsum("eki,ei->ek", Jcw, xc[ci]) + jnp.einsum(
                "eki,ei->ek", Jpw, xp[pi]
            )  # (E,3)
            yc = psum(
                jnp.zeros((C, 6)).at[ci].add(jnp.einsum("eki,ek,e->ei", Jcw, ye, w))
            )
            yp = jnp.zeros((P, 3)).at[pi].add(jnp.einsum("eki,ek,e->ei", Jpw, ye, w))
            yc = yc + lam_dc * xc
            yp = yp + lam_dp * xp
            yc = jnp.where(cam_free[:, None], yc, 0.0)
            yp = jnp.where(pt_free[:, None], yp, 0.0)
            return yc, yp

        def precond(rc, rp):
            return (
                jnp.einsum("cij,cj->ci", Minv_c, rc),
                jnp.einsum("pij,pj->pi", Minv_p, rp),
            )

        # PCG for (H + lam D) dx = -b.
        bc_f = jnp.where(cam_free[:, None], -bc, 0.0)
        bp_f = jnp.where(pt_free[:, None], -bp, 0.0)
        xc0 = jnp.zeros_like(bc_f)
        xp0 = jnp.zeros_like(bp_f)
        rc, rp = bc_f, bp_f
        zc, zp = precond(rc, rp)
        pc, pp = zc, zp
        # Camera vectors are replicated (post-psum), so their dot terms
        # are already global; only the sharded point terms need a psum.
        rz = jnp.sum(rc * zc) + psum(jnp.sum(rp * zp))

        def cg_body(i, st):
            xc, xp, rc, rp, pc, pp, rz = st
            Apc, App = matvec(pc, pp)
            pAp = jnp.sum(pc * Apc) + psum(jnp.sum(pp * App))
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-12, 1e-12, pAp)
            xc = xc + alpha * pc
            xp = xp + alpha * pp
            rc = rc - alpha * Apc
            rp = rp - alpha * App
            zc, zp = precond(rc, rp)
            rz_new = jnp.sum(rc * zc) + psum(jnp.sum(rp * zp))
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
            pc = zc + beta * pc
            pp = zp + beta * pp
            return xc, xp, rc, rp, pc, pp, rz_new

        xc, xp, *_ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (xc0, xp0, rc, rp, pc, pp, rz)
        )

        # Apply candidate update.
        xc = jnp.where(cam_free[:, None], xc, 0.0)
        xp = jnp.where(pt_free[:, None], xp, 0.0)
        new_pose = jax.vmap(se3.retract)(cam_pose, xc)
        new_xyz = xyz + xp
        _, _, _, _, _, err_new, _, _ = build_system(new_pose, new_xyz)
        # Finite guard: float32 overflow in a diverged step must never be
        # accepted (NaN < x is False already; this also rejects -inf/inf
        # artifacts so they cannot poison later iterations).
        improved = (err_new < err) & jnp.isfinite(err_new)
        cam_pose = jnp.where(improved, new_pose, cam_pose)
        xyz = jnp.where(improved, new_xyz, xyz)
        lam = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (cam_pose, xyz, lam), err

    (cam_pose, xyz, _), _ = jax.lax.scan(
        lm_step, (problem.cam_pose, problem.xyz, jnp.float32(1e-4)),
        None, length=lm_iters,
    )

    # Final outlier classification (reference re-checks chi2 and depth
    # positivity after local BA, src/Optimizer.cc:860-886).
    r, _, _, depth_ok, is_stereo = _residuals_jacobians(problem, cam_pose, xyz, cam)
    chi2 = _chi2(r, problem.obs_inv_sigma2, is_stereo)
    th = jnp.where(is_stereo, chi2_outlier_stereo, chi2_outlier_mono)
    inlier = problem.obs_valid & depth_ok & (chi2 <= th)
    # A point whose final position explains NONE of its observations is a
    # failed optimization (typically a robustly-downweighted outlier that
    # drifted): revert it to its input position and let its (pruned)
    # observations + MapPointCulling dispose of it — the reference
    # equivalent of g2o erasing all the point's edges, after which the
    # <2-obs point is SetBadFlag'd (src/LocalMapping.cc:197-235). Its
    # inlier classification stays as computed (all outliers -> pruned).
    pt_has_inl = jnp.zeros((P,), bool).at[pi].max(inlier)
    keep = (pt_has_inl | ~pt_free)[:, None]
    xyz = jnp.where(keep, xyz, problem.xyz)
    # Belt-and-braces: never emit non-finite variables.
    xyz = jnp.where(jnp.all(jnp.isfinite(xyz), -1, keepdims=True), xyz, problem.xyz)
    pose_ok = jnp.all(jnp.isfinite(cam_pose), axis=(-2, -1))[:, None, None]
    cam_pose = jnp.where(pose_ok, cam_pose, problem.cam_pose)
    _, _, _, _, _, err, _, _ = build_system(cam_pose, xyz)
    return BAResult(cam_pose=cam_pose, xyz=xyz, obs_inlier=inlier, final_error=err)


bundle_adjust = jax.jit(
    bundle_adjust_impl,
    static_argnames=("lm_iters", "cg_iters", "robust", "axis_name"),
)
