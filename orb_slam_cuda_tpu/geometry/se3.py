"""SE(3) / SO(3) manifold operations.

TPU-native replacement for the reference's g2o `se3quat.h` (reference:
Thirdparty/g2o/g2o/types/se3quat.h) and the cv::Mat pose plumbing in
`src/Converter.cc`. Everything here is pure jnp, batched via vmap, and
safe inside jit (no data-dependent branching; small-angle cases handled
with Taylor-series `jnp.where` selects).

Conventions:
  * Poses are 4x4 row-major homogeneous matrices `T` mapping world->camera
    (the reference's `Tcw`, see src/Frame.cc:268-325 `isInFrustum`).
  * Tangent vectors are `xi = (rho, phi)` with translation part first and
    rotation part last, shape (6,), matching g2o's SE3Quat ordering.
  * Quaternions are (w, x, y, z).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(phi):
    """so(3) hat operator: (…,3) -> (…,3,3) skew-symmetric matrix."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi):
    """Rodrigues: (…,3) axis-angle -> (…,3,3) rotation matrix."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    KK = K @ K
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks near 0.
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * KK


def so3_log(R):
    """(…,3,3) rotation matrix -> (…,3) axis-angle.

    Formulated for differentiation safety: theta comes from atan2 (finite
    derivative at identity, unlike arccos'(1) = -inf), and every branch of
    the `where` selects is evaluated on guarded inputs so jacfwd/jacrev
    through this function stay NaN-free at theta -> 0 (pose-graph
    residuals sit exactly there at convergence).
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # |w| = 2 sin(theta); sqrt(x+eps) keeps d|w|/dw finite (=0) at w=0.
    sin_t = 0.5 * jnp.sqrt(jnp.sum(w * w, axis=-1) + 1e-24)
    theta = jnp.arctan2(sin_t, cos_t)
    small = theta < 1e-4
    theta_safe = jnp.where(small, 1.0, theta)
    sin_safe = jnp.where(small, 1.0, sin_t)
    # log = theta/(2 sin theta) * w, Taylor 0.5 + theta^2/12 near 0.
    scale = jnp.where(
        small, 0.5 + theta * theta / 12.0, 0.5 * theta_safe / sin_safe
    )
    log_generic = scale[..., None] * w
    # Near theta == pi, w ~ 0; recover axis from diag(R): R = I*cos + (1-cos) aa^T + sin [a]_x.
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0, 1.0)
    axis = jnp.sqrt(axis2)
    # Fix signs using off-diagonal sums (a_i a_j (1-cos) = (R_ij + R_ji)/2).
    sx = jnp.sign(jnp.where(w[..., 0] == 0, (R[..., 0, 1] + R[..., 1, 0]), w[..., 0]))
    axis = axis * jnp.stack(
        [
            jnp.where(sx == 0, 1.0, sx),
            jnp.sign((R[..., 0, 1] + R[..., 1, 0]) * jnp.where(sx == 0, 1.0, sx) + _EPS),
            jnp.sign((R[..., 0, 2] + R[..., 2, 0]) * jnp.where(sx == 0, 1.0, sx) + _EPS),
        ],
        axis=-1,
    )
    log_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], log_pi, log_generic)


def _left_jacobian(phi):
    """SO(3) left Jacobian J_l(phi), used by se3 exp for the translation."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    KK = K @ K
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, (theta - jnp.sin(theta)) / (theta2 * theta), 1.0 / 6.0 - theta2 / 120.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * KK


def _left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    KK = K @ K
    half = 0.5 * theta
    cot = jnp.where(theta2 > _EPS, half / jnp.tan(half + _EPS), 1.0 - theta2 / 12.0)
    coef = jnp.where(theta2 > _EPS, (1.0 - cot) / theta2, 1.0 / 12.0 + theta2 / 720.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + coef * KK


def exp(xi):
    """se(3) exp: (…,6) tangent (rho, phi) -> (…,4,4) transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = (_left_jacobian(phi) @ rho[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def log(T):
    """(…,4,4) transform -> (…,6) tangent (rho, phi)."""
    phi = so3_log(T[..., :3, :3])
    rho = (_left_jacobian_inv(phi) @ T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def orthonormalize(T):
    """Project the rotation block of (…,4,4) back onto SO(3).

    Two Newton steps of the polar-decomposition iteration
    X <- X (3I - X^T X) / 2 (quadratically convergent for nearly
    orthonormal X). Needed wherever poses chain multiplicatively across
    frames without passing through a host-side general inverse: the
    transpose-based `inverse` below assumes R in SO(3), so per-frame
    float32 retract defects otherwise ADD along the chain
    (e_{n+1} = 2 e_n + e_{n-1}, i.e. (1+sqrt(2))x growth per frame) until
    the rotation collapses."""
    R = T[..., :3, :3]
    eye3 = jnp.eye(3, dtype=T.dtype)
    for _ in range(2):
        R = R @ (3.0 * eye3 - jnp.swapaxes(R, -1, -2) @ R) * 0.5
    return T.at[..., :3, :3].set(R)


def inverse(T):
    """Inverse of (…,4,4) rigid transform without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3:4].set(-(Rt @ t))
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def compose(A, B):
    """A @ B for (…,4,4) transforms."""
    return A @ B


def transform(T, X):
    """Apply (…,4,4) to points (…,N,3) (or (…,3)) -> same shape."""
    squeeze = X.ndim == T.ndim - 1
    if squeeze:
        X = X[..., None, :]
    Y = X @ jnp.swapaxes(T[..., :3, :3], -1, -2) + T[..., None, :3, 3]
    return Y[..., 0, :] if squeeze else Y


def retract(T, xi):
    """Left-multiplicative update used by all LM solvers: exp(xi) @ T.

    Matches g2o's SE3 vertex `oplusImpl` (exp update composed onto the
    estimate), the convention the reference's Optimizer relies on
    (reference: src/Optimizer.cc:334-543 PoseOptimization).
    """
    return compose(exp(xi), T)


def quat_to_rot(q):
    """(…,4) quaternion (w,x,y,z) -> (…,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """(…,3,3) -> (…,4) quaternion (w,x,y,z), w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions
    and select the best-conditioned one with `where` (jit-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    qw0 = _safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = _safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = _safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = _safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q * jnp.sign(jnp.where(q[..., 0:1] == 0, 1.0, q[..., 0:1]))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def make_T(R, t):
    """Assemble (…,4,4) from (…,3,3) and (…,3)."""
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
