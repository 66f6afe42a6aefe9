"""Sim(3) estimation: batched Horn closed-form + vmapped RANSAC.

TPU-native replacement for the reference's `Sim3Solver`
(reference: src/Sim3Solver.cc): the sequential 300-iteration RANSAC loop
over Horn's quaternion method (:226-339) becomes one vmapped hypothesis
batch; the bidirectional reprojection inlier check (:340-366) is a
batched projection. Mono estimates scale; stereo/RGBD fixes s=1
(reference ctor mbFixScale).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Camera


class Sim3Result(NamedTuple):
    R: jnp.ndarray  # (3,3) maps frame-2 coords to frame-1 coords
    t: jnp.ndarray  # (3,)
    s: jnp.ndarray  # ()
    inliers: jnp.ndarray  # (M,) bool
    n_inliers: jnp.ndarray  # ()
    ok: jnp.ndarray  # () bool


def horn_sim3(x1, x2, fix_scale: bool = False):
    """Closed-form Sim3 from 3+ correspondences: x1 ≈ s R x2 + t.

    Horn's quaternion method as in the reference (src/Sim3Solver.cc:
    226-339), but via the eigen-decomposition of the N-matrix batched
    over hypothesis sets.

    Args:
      x1, x2: (K,3) point sets (camera-frame coordinates).
    """
    c1 = x1.mean(axis=0)
    c2 = x2.mean(axis=0)
    y1 = x1 - c1
    y2 = x2 - c2
    # M = sum y2_i y1_i^T: with Horn's N-matrix layout below and a
    # (w,x,y,z) quaternion this yields R mapping x2 into x1 (verified
    # numerically against sim3.exp ground truth).
    M = y2.T @ y1
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    _, V = jnp.linalg.eigh(N)
    q = V[:, -1]  # (w,x,y,z) max-eigenvalue quaternion
    from ..geometry import se3

    R = se3.quat_to_rot(q)
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        # Symmetric scale (Horn eq. 39): s = sqrt(sum|y1|^2 / sum|y2|^2)
        # — the reference uses the asymmetric form D/Sxx... keep
        # symmetric (more stable, same fixed point for clean data).
        s = jnp.sqrt(
            jnp.sum(y1 * y1) / jnp.maximum(jnp.sum(jnp.square(y2 @ R.T)), 1e-12)
        )
    t = c1 - s * (R @ c2)
    return R, t, s


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "fix_scale"))
def solve_sim3_ransac(
    x1,
    x2,
    uv1,
    uv2,
    valid,
    cam: Camera,
    key,
    err_th1,
    err_th2,
    n_hypotheses: int = 128,
    fix_scale: bool = False,
    min_inliers: int = 20,
):
    """RANSAC Sim3 between matched camera-frame point sets.

    Mirrors Sim3Solver::iterate (reference src/Sim3Solver.cc:140-208):
    3-point hypotheses -> Horn -> bidirectional reprojection inlier count
    with per-match chi2 thresholds (9.210 * sigma2, :114-127).

    Args:
      x1/x2: (M,3) matched 3D points in camera 1 / camera 2 frames.
      uv1/uv2: (M,2) their observed keypoints in images 1/2.
      err_th1/err_th2: (M,) squared-pixel thresholds per match.
    """
    M = x1.shape[0]

    def draw(k):
        r = jax.random.uniform(k, (M,))
        r = jnp.where(valid, r, -1.0)
        return jnp.argsort(-r)[:3]

    keys = jax.random.split(key, n_hypotheses)
    sets = jax.vmap(draw)(keys)

    from ..geometry import camera as cam_mod

    def count_inliers(R, t, s):
        # x2 -> frame1, project into image 1; x1 -> frame2, project into 2.
        x2_in_1 = s * (x2 @ R.T) + t
        proj1 = cam_mod.project(cam, x2_in_1)
        si = 1.0 / jnp.maximum(s, 1e-12)
        x1_in_2 = si * ((x1 - t) @ R)
        proj2 = cam_mod.project(cam, x1_in_2)
        e1 = jnp.sum((proj1 - uv1) ** 2, axis=-1)
        e2 = jnp.sum((proj2 - uv2) ** 2, axis=-1)
        inl = valid & (e1 < err_th1) & (e2 < err_th2)
        inl = inl & (x2_in_1[:, 2] > 0) & (x1_in_2[:, 2] > 0)
        return inl

    def eval_hyp(idx):
        R, t, s = horn_sim3(x1[idx], x2[idx], fix_scale)
        inl = count_inliers(R, t, s)
        return jnp.sum(inl), R, t, s

    n_inl, Rs, ts, ss = jax.vmap(eval_hyp)(sets)
    best = jnp.argmax(n_inl)
    R, t, s = Rs[best], ts[best], ss[best]

    # Refine on inliers (weighted Horn) — one round.
    inl = count_inliers(R, t, s)
    w = inl.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(w), 3.0)
    c1 = jnp.sum(x1 * w, axis=0) / n
    c2 = jnp.sum(x2 * w, axis=0) / n
    y1 = (x1 - c1) * w
    y2 = (x2 - c2) * w
    Mm = y2.T @ y1
    N4 = jnp.array(
        [
            [Mm[0, 0] + Mm[1, 1] + Mm[2, 2], Mm[1, 2] - Mm[2, 1], Mm[2, 0] - Mm[0, 2], Mm[0, 1] - Mm[1, 0]],
            [Mm[1, 2] - Mm[2, 1], Mm[0, 0] - Mm[1, 1] - Mm[2, 2], Mm[0, 1] + Mm[1, 0], Mm[2, 0] + Mm[0, 2]],
            [Mm[2, 0] - Mm[0, 2], Mm[0, 1] + Mm[1, 0], -Mm[0, 0] + Mm[1, 1] - Mm[2, 2], Mm[1, 2] + Mm[2, 1]],
            [Mm[0, 1] - Mm[1, 0], Mm[2, 0] + Mm[0, 2], Mm[1, 2] + Mm[2, 1], -Mm[0, 0] - Mm[1, 1] + Mm[2, 2]],
        ]
    )
    from ..geometry import se3

    _, V = jnp.linalg.eigh(N4)
    Rr = se3.quat_to_rot(V[:, -1])
    if fix_scale:
        sr = jnp.float32(1.0)
    else:
        sr = jnp.sqrt(
            jnp.sum(y1 * y1) / jnp.maximum(jnp.sum(jnp.square(y2 @ Rr.T)), 1e-12)
        )
    tr = c1 - sr * (Rr @ c2)
    inl_r = count_inliers(Rr, tr, sr)
    better = jnp.sum(inl_r) >= jnp.sum(inl)
    R = jnp.where(better, Rr, R)
    t = jnp.where(better, tr, t)
    s = jnp.where(better, sr, s)
    inl = jnp.where(better, inl_r, inl)

    n_in = jnp.sum(inl)
    return Sim3Result(
        R=R, t=t, s=s, inliers=inl, n_inliers=n_in, ok=n_in >= min_inliers
    )
