"""Sim(3) similarity-transform manifold ops.

TPU-native replacement for g2o's `sim3.h` (reference:
Thirdparty/g2o/g2o/types/sim3.h) used by loop closing: Sim3 solving
(src/Sim3Solver.cc), `OptimizeSim3` and `OptimizeEssentialGraph`
(src/Optimizer.cc:927-1417).

Representation: a Sim3 is the tuple of arrays ``(R (…,3,3), t (…,3),
s (…,))`` acting on points as ``x -> s * R @ x + t``. Tangent vectors are
(…,7): ``(rho, phi, sigma)`` — translation, rotation, log-scale — matching
g2o's Sim3 ordering.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8


def identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    t = jnp.zeros(batch_shape + (3,), dtype)
    s = jnp.ones(batch_shape, dtype)
    return R, t, s


def compose(a, b):
    """(Ra,ta,sa) ∘ (Rb,tb,sb): x -> sa Ra (sb Rb x + tb) + ta."""
    Ra, ta, sa = a
    Rb, tb, sb = b
    R = Ra @ Rb
    t = sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta
    s = sa * sb
    return R, t, s


def inverse(S):
    R, t, s = S
    Ri = jnp.swapaxes(R, -1, -2)
    si = 1.0 / s
    ti = -si[..., None] * (Ri @ t[..., None])[..., 0]
    return Ri, ti, si


def transform(S, X):
    """Apply Sim3 to points (…,N,3) or (…,3)."""
    R, t, s = S
    squeeze = X.ndim == R.ndim - 1
    if squeeze:
        X = X[..., None, :]
    Y = s[..., None, None] * (X @ jnp.swapaxes(R, -1, -2)) + t[..., None, :]
    return Y[..., 0, :] if squeeze else Y


def exp(xi):
    """sim(3) exp: (…,7) (rho, phi, sigma) -> (R, t, s).

    Closed form from Strasdat's "Scale-Drift Aware Large Scale Monocular
    SLAM" (the algorithm family g2o's sim3.h implements; re-derived here).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    K = se3.hat(phi)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    # W = A*I + B*K + C*KK (the sim3 "V" matrix with scale coupling).
    near_zero_sigma = jnp.abs(sigma) < 1e-5
    near_zero_theta = theta2 < _EPS
    sig = jnp.where(near_zero_sigma, 1.0, sigma)  # avoid 0/0; selected out below
    th = jnp.where(near_zero_theta, 1.0, theta)

    # C coefficient (scale-only term).
    C = jnp.where(near_zero_sigma, 1.0, (s - 1.0) / sig)

    a_ = s * jnp.sin(th)
    b_ = s * jnp.cos(th)
    th2_sig2 = th * th + sig * sig
    # Generic A,B for theta>0.
    A_g = jnp.where(
        near_zero_sigma,
        (1.0 - jnp.cos(th)) / jnp.maximum(th * th, _EPS),
        (a_ * sig + (1.0 - b_) * th) / jnp.maximum(th * th2_sig2, _EPS),
    )
    B_g = jnp.where(
        near_zero_sigma,
        (th - jnp.sin(th)) / jnp.maximum(th * th * th, _EPS),
        (C - ((b_ - 1.0) * sig + a_ * th) / th2_sig2) / jnp.maximum(th * th, _EPS),
    )
    A = jnp.where(near_zero_theta, jnp.zeros_like(A_g), A_g)
    B = jnp.where(near_zero_theta, jnp.zeros_like(B_g), B_g)

    W = C[..., None, None] * eye + A[..., None, None] * K + B[..., None, None] * KK
    t = (W @ rho[..., None])[..., 0]
    return R, t, s


def log(S):
    """(R, t, s) -> (…,7) tangent. Inverse of `exp` (solves W rho = t)."""
    R, t, s = S
    phi = se3.so3_log(R)
    sigma = jnp.log(s)
    # Recompute W from (phi, sigma) exactly as in exp, then invert (3x3).
    W = _w_matrix(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def _w_matrix(phi, sigma):
    xi = jnp.concatenate([jnp.zeros(phi.shape[:-1] + (3,), phi.dtype), phi, sigma[..., None]], axis=-1)
    rho_basis = jnp.eye(3, dtype=phi.dtype)
    cols = []
    for i in range(3):
        xi_i = xi.at[..., :3].set(jnp.broadcast_to(rho_basis[i], phi.shape))
        _, t_i, _ = exp(xi_i)
        cols.append(t_i)
    return jnp.stack(cols, axis=-1)


def retract(S, xi):
    """Left-multiplicative LM update: exp(xi) ∘ S."""
    return compose(exp(xi), S)


def from_se3(T, s=None):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if s is None:
        s = jnp.ones(T.shape[:-2], T.dtype)
    return R, t, s


def to_se3(S):
    """Project Sim3 to SE3 by folding scale into translation (t/s), the
    correction applied to keyframe poses after essential-graph optimization
    (reference: src/LoopClosing.cc:554-566 — [R t/s; 0 1])."""
    R, t, s = S
    return se3.make_T(R, t / s[..., None])


def stack(Ss):
    Rs, ts, ss = zip(*Ss)
    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(ss)
