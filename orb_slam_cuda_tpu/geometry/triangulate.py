"""Batched two-view triangulation and epipolar geometry helpers.

Replaces the per-match SVD loops of the reference: the DLT triangulation
inside `LocalMapping::CreateNewMapPoints` (reference:
src/LocalMapping.cc:237-486) and `Initializer::Triangulate`
(src/Initializer.cc:734-760). Here whole match-batches are triangulated at
once; the 4x4 SVD per match becomes a batched `jnp.linalg` call that XLA
vectorizes.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(P1, P2, xy1, xy2):
    """Linear (DLT) triangulation.

    Args:
      P1, P2: (3,4) projection matrices (K [R|t] or normalized [R|t]).
      xy1, xy2: (N,2) image coords in the frame of P1/P2 respectively.

    Returns:
      X: (N,3) triangulated points (homogeneous-normalized).
    """
    # Build A (N,4,4): rows x*P3-P1, y*P3-P2 for each view.
    def rows(P, xy):
        r1 = xy[..., 0:1] * P[2] - P[0]
        r2 = xy[..., 1:2] * P[2] - P[1]
        return jnp.stack([r1, r2], axis=-2)

    A = jnp.concatenate([rows(P1, xy1), rows(P2, xy2)], axis=-2)
    # Null vector of A == eigenvector of A^T A with smallest eigenvalue.
    # eigh on (N,4,4) symmetric matrices is batched and TPU-friendly,
    # avoiding full SVD of A.
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, V = jnp.linalg.eigh(AtA)
    Xh = V[..., :, 0]  # eigenvector for the smallest eigenvalue
    w = Xh[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / w[..., None]


def projection_matrix(K, T):
    """K (3,3) and world->cam T (4,4) -> P = K [R|t] (3,4)."""
    return K @ T[:3, :4]


def cheirality_and_parallax(X, T1, T2):
    """Per-point validity checks matching `Initializer::CheckRT`
    (reference: src/Initializer.cc:798-908): positive depth in both views
    and the cosine of the parallax angle.

    Args:
      X: (N,3) world points. T1, T2: (4,4) world->cam poses.

    Returns:
      (z1, z2, cos_parallax): each (N,).
    """
    C1 = -T1[:3, :3].T @ T1[:3, 3]
    C2 = -T2[:3, :3].T @ T2[:3, 3]
    z1 = (X @ T1[:3, :3].T + T1[:3, 3])[..., 2]
    z2 = (X @ T2[:3, :3].T + T2[:3, 3])[..., 2]
    d1 = X - C1
    d2 = X - C2
    n1 = jnp.linalg.norm(d1, axis=-1)
    n2 = jnp.linalg.norm(d2, axis=-1)
    cosp = jnp.sum(d1 * d2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)
    return z1, z2, cosp


def fundamental_from_poses(K1, T1w, K2, T2w):
    """F12 such that x2^T F x1 = 0, from two world->cam poses.

    Replaces `LocalMapping::ComputeF12` (reference:
    src/LocalMapping.cc:572-590).
    """
    T12 = T1w @ jnp.linalg.inv(T2w)  # cam2 -> cam1
    R12 = T12[:3, :3]
    t12 = T12[:3, 3]
    tx = jnp.array(
        [[0.0, -t12[2], t12[1]], [t12[2], 0.0, -t12[0]], [-t12[1], t12[0], 0.0]],
        T1w.dtype,
    )
    # x1^T F12 x2 = 0 convention used by the reference's CheckDistEpipolarLine.
    return jnp.linalg.inv(K1).T @ tx @ R12 @ jnp.linalg.inv(K2)


def epipolar_distance_sq(F12, xy1, xy2):
    """Squared distance of x2 to the epipolar line of x1 (and symmetric),
    the gate in `ORBmatcher::CheckDistEpipolarLine` (reference:
    src/ORBmatcher.cc:1603-1622). Returns (N,) squared distance in image 2.
    """
    x1h = jnp.concatenate([xy1, jnp.ones_like(xy1[..., :1])], axis=-1)
    line = x1h @ F12  # (N,3) line l2 = F12^T x1 in image 2: a,b,c
    a, b, c = line[..., 0], line[..., 1], line[..., 2]
    num = a * xy2[..., 0] + b * xy2[..., 1] + c
    den = jnp.maximum(a * a + b * b, 1e-12)
    return num * num / den
