"""EPnP + RANSAC relocalization pose solver.

TPU-native replacement for the reference's `PnPsolver`
(reference: src/PnPsolver.cc — Lepetit's EPnP with 4 control points,
barycentric coordinates, the beta cases and Gauss-Newton refinement
:477-842, wrapped in an adaptive RANSAC :165-259). Here the RANSAC
hypotheses are one vmapped batch of minimal 4-point EPnP solves (beta
case N=1), followed by an all-inlier EPnP refit and a robust pose-only
LM polish (solvers.pose_opt) that plays the role of the reference's
final refine(). Fixed budgets replace the adaptive iteration count
(SURVEY.md §7 hard part (d)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera
from . import pose_opt


class PnPResult(NamedTuple):
    pose: jnp.ndarray  # (4,4) Tcw
    inliers: jnp.ndarray  # (M,) bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def _control_points(Xw, w):
    """Centroid + principal axes control points (reference
    choose_control_points, src/PnPsolver.cc:527-568)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(Xw * w[:, None], axis=0) / wsum
    Y = (Xw - c0) * jnp.sqrt(w)[:, None]
    cov = Y.T @ Y / wsum
    eval_, evec = jnp.linalg.eigh(cov)
    # Scale axes by sqrt of eigenvalues (largest last in eigh).
    axes = evec * jnp.sqrt(jnp.maximum(eval_, 1e-12))[None, :]
    c = jnp.stack([c0, c0 + axes[:, 2], c0 + axes[:, 1], c0 + axes[:, 0]])
    return c  # (4,3)


def _barycentric(Xw, ctrl):
    """(n,4) barycentric coords wrt control points (reference
    compute_barycentric_coordinates, src/PnPsolver.cc:570-600)."""
    B = (ctrl[1:] - ctrl[0]).T  # (3,3)
    Binv = jnp.linalg.inv(B + 1e-12 * jnp.eye(3))
    a123 = (Xw - ctrl[0]) @ Binv.T  # (n,3)
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _build_MtM(alphas, uv, w, cam: Camera):
    """12x12 normal matrix of the EPnP M system (reference fill_M +
    the MtM product computed on GPU-free path, src/PnPsolver.cc:602-630)."""
    n = alphas.shape[0]
    u = uv[:, 0]
    v = uv[:, 1]
    # Row pairs: for each point i and control j:
    #  [a_j fx, 0, a_j (cx - u)] and [0, a_j fy, a_j (cy - v)]
    M1 = jnp.zeros((n, 12))
    M2 = jnp.zeros((n, 12))
    for j in range(4):
        a = alphas[:, j]
        M1 = M1.at[:, 3 * j + 0].set(a * cam.fx)
        M1 = M1.at[:, 3 * j + 2].set(a * (cam.cx - u))
        M2 = M2.at[:, 3 * j + 1].set(a * cam.fy)
        M2 = M2.at[:, 3 * j + 2].set(a * (cam.cy - v))
    MtM = (M1 * w[:, None]).T @ M1 + (M2 * w[:, None]).T @ M2
    return MtM


def _rigid_align(A, B):
    """Least-squares rigid transform mapping A (K,3) onto B (K,3)
    (Horn; the reference's estimate_R_and_t, src/PnPsolver.cc:750-792)."""
    ca = A.mean(axis=0)
    cb = B.mean(axis=0)
    H = (A - ca).T @ (B - cb)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) .at[2].set(d))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    return R, t


def _epnp_from_weights(Xw, uv, w, cam: Camera):
    """One EPnP solve (beta case N=1, the dominant case + the one the
    minimal 4-point configuration determines) -> (4,4) Tcw."""
    ctrl_w = _control_points(Xw, w)
    alphas = _barycentric(Xw, ctrl_w)
    MtM = _build_MtM(alphas, uv, w, cam)
    _, V = jnp.linalg.eigh(MtM)
    v1 = V[:, 0].reshape(4, 3)  # kernel vector -> candidate cam ctrl pts

    # Beta for N=1 from distance preservation (reference
    # compute_betas_approx_1 + scaling in compute_ccs/compute_pcs).
    def pdists(C):
        diff = C[:, None, :] - C[None, :, :]
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)

    dw = pdists(ctrl_w)
    dc = pdists(v1)
    iu = jnp.triu_indices(4, 1)
    beta = jnp.sum(dc[iu] * dw[iu]) / jnp.maximum(jnp.sum(dc[iu] ** 2), 1e-12)
    ctrl_c = beta * v1
    # Cheirality: points must have positive depth.
    pc = alphas @ ctrl_c  # (n,3) camera-frame points
    sign = jnp.sign(jnp.sum(jnp.where(w > 0, pc[:, 2], 0.0)))
    sign = jnp.where(sign == 0, 1.0, sign)
    ctrl_c = ctrl_c * sign
    R, t = _rigid_align(ctrl_w, ctrl_c)
    return se3.make_T(R, t)


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def solve_pnp_ransac(
    Xw,
    uv,
    valid,
    err_th2,
    cam: Camera,
    key,
    n_hypotheses: int = 512,
    min_inliers: int = 10,
) -> PnPResult:
    """RANSAC EPnP (reference PnPsolver::iterate, src/PnPsolver.cc:165-259:
    minimal sets, chi2 inlier gate 5.991*sigma2 per octave via
    `err_th2`, refine on the best consensus).

    Args:
      Xw: (M,3) world points; uv: (M,2) observed (undistorted) pixels.
      err_th2: (M,) per-match squared-pixel thresholds.
    """
    M = Xw.shape[0]

    from ..geometry import camera as cam_mod

    def reproj_inliers(T):
        Xc = se3.transform(T, Xw)
        proj = cam_mod.project(cam, Xc)
        e2 = jnp.sum((proj - uv) ** 2, axis=-1)
        return valid & (e2 < err_th2) & (Xc[:, 2] > 0)

    def hyp(k):
        # 6-point minimal sets: with 12 equations the EPnP kernel is
        # one-dimensional and the N=1 beta case is exact, avoiding the
        # reference's beta-case ladder (compute_pose N=1..3,
        # src/PnPsolver.cc:477-526) at the cost of slightly larger sets —
        # compensated by the vmapped hypothesis count.
        r = jax.random.uniform(k, (M,))
        r = jnp.where(valid, r, -1.0)
        idx = jnp.argsort(-r)[:6]
        w = jnp.zeros((M,)).at[idx].set(1.0)
        T = _epnp_from_weights(Xw, uv, w, cam)
        return jnp.sum(reproj_inliers(T)), T

    keys = jax.random.split(key, n_hypotheses)
    counts, Ts = jax.vmap(hyp)(keys)
    best = jnp.argmax(counts)
    T0 = Ts[best]

    # Refit on full consensus (EPnP with inlier weights), then robust LM.
    inl = reproj_inliers(T0)
    T1 = _epnp_from_weights(Xw, uv, inl.astype(jnp.float32), cam)
    # Keep whichever pose explains more inliers (degenerate refits happen
    # when the consensus is nearly planar).
    better = jnp.sum(reproj_inliers(T1)) >= jnp.sum(inl)
    T_init = jnp.where(better, T1, T0)
    inl2 = reproj_inliers(T_init)

    res = pose_opt.optimize_pose(
        T_init, Xw, uv, jnp.full((M,), -1.0),
        jnp.ones((M,), jnp.float32), inl2, cam,
        rounds=2, iters_per_round=10,
    )
    final_inl = reproj_inliers(res.pose) & res.inliers
    n = jnp.sum(final_inl)
    return PnPResult(
        pose=res.pose, inliers=final_inl, n_inliers=n, ok=n >= min_inliers
    )
