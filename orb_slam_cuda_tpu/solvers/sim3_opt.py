"""Joint Sim3 refinement over bidirectional reprojection edges.

TPU-native replacement for `Optimizer::OptimizeSim3` (reference:
src/Optimizer.cc:1190-1417): one Sim3 vertex S12, fixed 3D points
expressed in each keyframe's camera frame, and a PAIR of Huber-robust
reprojection edges per correspondence —

    e12: uv1 - project(S12 · X2c)      (g2o EdgeSim3ProjectXYZ)
    e21: uv2 - project(S12^-1 · X1c)   (g2o EdgeInverseSim3ProjectXYZ)

with the reference's schedule: 5 LM iterations, chi2 > th2 pair removal,
then 10 more iterations (the reference runs 5 when nothing was removed;
always running 10 on the same inlier set only tightens convergence),
fail if fewer than 10 correspondences survive the first cut.

The g2o vertex/edge graph becomes dense (M,) residual batches whose
Jacobians come from forward-mode autodiff of the retraction at 0; the
whole schedule is ONE jitted call. Both keyframes share the engine's
single camera model (the reference carries K1/K2 separately but they are
identical in every dataset config it ships).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3
from ..geometry.camera import Camera


class Sim3OptResult(NamedTuple):
    R: jnp.ndarray  # (3,3)
    t: jnp.ndarray  # (3,)
    s: jnp.ndarray  # ()
    inliers: jnp.ndarray  # (M,) bool — both edges of the pair under th2
    n_inliers: jnp.ndarray  # () int32 (0 when the <10-survivors gate fails)


def _pair_residuals(S, x1c, x2c, cam: Camera):
    """(M,2) residuals of both edge families at Sim3 estimate S."""
    y1 = sim3.transform(S, x2c)  # into KF1 camera frame
    y2 = sim3.transform(sim3.inverse(S), x1c)  # into KF2 camera frame

    def proj(y):
        z = jnp.where(y[:, 2] > 1e-6, y[:, 2], 1e-6)
        u = cam.fx * y[:, 0] / z + cam.cx
        v = cam.fy * y[:, 1] / z + cam.cy
        return jnp.stack([u, v], axis=-1)

    return proj(y1), proj(y2), y1[:, 2] > 1e-6, y2[:, 2] > 1e-6


@functools.partial(jax.jit, static_argnames=("fix_scale",))
def optimize_sim3(
    S12,
    x1c,
    x2c,
    uv1,
    uv2,
    inv_sigma2_1,
    inv_sigma2_2,
    valid,
    cam: Camera,
    fix_scale: bool = False,
    th2: float = 10.0,
):
    """Args (mirroring the reference's edge setup, src/Optimizer.cc:
    1243-1321):
      S12: (R,t,s) initial estimate (Sim3 solver RANSAC output).
      x1c/x2c: (M,3) correspondence points in KF1/KF2 CAMERA frames
        (fixed vertices, src/Optimizer.cc:1262-1276).
      uv1/uv2: (M,2) observed keypoints in KF1/KF2.
      inv_sigma2_*: (M,) information by keypoint octave.
      valid: (M,) bool correspondence mask.
    """
    delta = jnp.sqrt(jnp.float32(th2))

    def chi2_pair(S):
        p1, p2, ok1, ok2 = _pair_residuals(S, x1c, x2c, cam)
        r1 = p1 - uv1
        r2 = p2 - uv2
        c1 = jnp.sum(r1 * r1, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, axis=-1) * inv_sigma2_2
        return r1, r2, c1, c2, ok1 & ok2

    def lm_iters(S, active, n_iters):
        def step(carry, _):
            S, lam = carry
            R, t, s = S

            def flat_res(xi):
                Sx = sim3.retract((R, t, s), xi)
                p1, p2, _, _ = _pair_residuals(Sx, x1c, x2c, cam)
                return jnp.concatenate([p1 - uv1, p2 - uv2], axis=0)  # (2M,2)

            r = flat_res(jnp.zeros((7,), jnp.float32))
            J = jax.jacfwd(flat_res)(jnp.zeros((7,), jnp.float32))  # (2M,2,7)
            isig = jnp.concatenate([inv_sigma2_1, inv_sigma2_2])
            act2 = jnp.concatenate([active, active])
            chi2 = jnp.sum(r * r, axis=-1) * isig
            e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
            w_rob = jnp.where(e > delta, delta / e, 1.0)
            w = jnp.where(act2, isig * w_rob, 0.0)
            H = jnp.einsum("mki,mkj,m->ij", J, J, w)
            g = jnp.einsum("mki,mk,m->i", J, r, w)
            if fix_scale:
                # Pin the scale coordinate (g2o VertexSim3Expmap._fix_scale).
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            D = jnp.diag(jnp.maximum(jnp.diag(H), 1e-8))
            xi = -jnp.linalg.solve(H + lam * D, g)
            if fix_scale:
                xi = xi.at[6].set(0.0)
            S_new = sim3.retract(S, xi)
            err_old = jnp.sum(jnp.where(act2, chi2 * w_rob, 0.0))
            r_new = jnp.concatenate(
                [
                    _pair_residuals(S_new, x1c, x2c, cam)[0] - uv1,
                    _pair_residuals(S_new, x1c, x2c, cam)[1] - uv2,
                ],
                axis=0,
            )
            chi2_new = jnp.sum(r_new * r_new, axis=-1) * isig
            e_n = jnp.sqrt(jnp.maximum(chi2_new, 1e-12))
            w_n = jnp.where(e_n > delta, delta / e_n, 1.0)
            err_new = jnp.sum(jnp.where(act2, chi2_new * w_n, 0.0))
            improved = err_new < err_old
            R_o, t_o, s_o = S
            R_n, t_n, s_n = S_new
            S = (
                jnp.where(improved, R_n, R_o),
                jnp.where(improved, t_n, t_o),
                jnp.where(improved, s_n, s_o),
            )
            lam = jnp.clip(
                jnp.where(improved, lam * 0.5, lam * 4.0), 1e-9, 1e6
            )
            return (S, lam), None

        (S, _), _ = jax.lax.scan(step, (S, jnp.float32(1e-3)), None, length=n_iters)
        return S

    # Round 1: 5 iterations on all valid correspondences.
    S = lm_iters(S12, valid, 5)
    _, _, c1, c2, depth_ok = chi2_pair(S)
    inl = valid & depth_ok & (c1 <= th2) & (c2 <= th2)
    n_good = jnp.sum(inl)

    # Round 2: 10 more iterations on survivors.
    S = lm_iters(S, inl, 10)
    _, _, c1, c2, depth_ok = chi2_pair(S)
    inl2 = inl & depth_ok & (c1 <= th2) & (c2 <= th2)
    # The reference aborts when fewer than 10 correspondences survive the
    # first classification (src/Optimizer.cc:1360-1361).
    n_in = jnp.where(n_good >= 10, jnp.sum(inl2), 0).astype(jnp.int32)
    R, t, s = S
    return Sim3OptResult(R=R, t=t, s=s, inliers=inl2, n_inliers=n_in)
