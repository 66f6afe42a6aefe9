"""Monocular two-view initialization: vmapped H/F RANSAC + reconstruction.

TPU-native replacement for the reference's `Initializer` (reference:
src/Initializer.cc): its two CPU threads racing homography and fundamental
RANSAC (src/Initializer.cc:104-105) become two vmapped hypothesis batches
evaluated in one jit; model selection keeps the RH = SH/(SH+SF) > 0.40
rule (:117-121), reconstruction keeps ReconstructF's E-decomposition with
4-motion cheirality disambiguation (:470-571) and ReconstructH's Faugeras
8-motion decomposition (:572-733), and the per-candidate quality gates of
CheckRT (:798-908).

Everything is fixed-shape: M matches (padded + mask), NH hypotheses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import triangulate

SIGMA = 1.0
TH_F = 3.841
TH_H = 5.991
TH_SCORE = 5.991  # score saturation (reference thScore)


class InitResult(NamedTuple):
    success: jnp.ndarray  # () bool
    R: jnp.ndarray  # (3,3) cam1->cam2 rotation
    t: jnp.ndarray  # (3,) unit translation
    points: jnp.ndarray  # (M,3) triangulated in cam1 frame
    is_point: jnp.ndarray  # (M,) bool triangulated OK
    used_homography: jnp.ndarray  # () bool


def _normalize(xy, valid):
    """Mean/mean-abs-dev normalization (reference Initializer::Normalize
    src/Initializer.cc:762-797). Returns (xyn, T) with T (3,3)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    d = jnp.abs(xy - mean) * w[:, None]
    md = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    xyn = (xy - mean) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return xyn, T


def _smallest_eigvec(A):
    """Unit null-ish vector of (R,9)ᵀ(R,9) via eigh — batched-safe."""
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    return V[:, 0]


def _fit_f(x1, x2, w=None):
    """8-point fundamental from normalized coords, rank-2 enforced
    (reference ComputeF21, src/Initializer.cc:226-264). With `w` given,
    solves the weighted least-squares over all rows (inlier refit — an
    accuracy improvement over the reference's minimal-set-only model)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    one = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )  # (R,9), row: x2^T F x1 = 0
    if w is not None:
        A = A * w[:, None]
    f = _smallest_eigvec(A)
    F = f.reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt


def _fit_h(x1, x2, w=None):
    """DLT homography x2 ~ H x1 (reference ComputeH21,
    src/Initializer.cc:194-225); optional row weights for inlier refit."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([zero, zero, zero, -u1, -v1, -one, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    if w is not None:
        r1 = r1 * w[:, None]
        r2 = r2 * w[:, None]
    A = jnp.concatenate([r1, r2], axis=0)  # (2R,9)
    h = _smallest_eigvec(A)
    return h.reshape(3, 3)


def _score_f(F, xy1, xy2, valid):
    """Symmetric epipolar transfer score (reference CheckFundamental,
    src/Initializer.cc:330-412): per direction add (thScore - chi2) when
    chi2 < th(3.841), inlier iff both directions pass."""
    # Our F satisfies x2^T F x1 = 0; epipolar_distance_sq(F12, a, b)
    # expects a^T F12 b = 0 (line for b is F12^T a), so pass F.T for the
    # image-2 distance and F for the image-1 distance.
    inv_s2 = 1.0 / (SIGMA * SIGMA)
    d2_21 = triangulate.epipolar_distance_sq(F.T, xy1, xy2) * inv_s2
    d2_12 = triangulate.epipolar_distance_sq(F, xy2, xy1) * inv_s2
    ok1 = d2_21 < TH_F
    ok2 = d2_12 < TH_F
    score = jnp.where(ok1 & valid, TH_SCORE - d2_21, 0.0) + jnp.where(
        ok2 & valid, TH_SCORE - d2_12, 0.0
    )
    inlier = ok1 & ok2 & valid
    return jnp.sum(score), inlier


def _apply_h(H, xy):
    xyh = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], axis=-1)
    y = xyh @ H.T
    return y[:, :2] / jnp.where(jnp.abs(y[:, 2:3]) < 1e-12, 1e-12, y[:, 2:3])


def _score_h(H, xy1, xy2, valid):
    """Symmetric transfer score for H (reference CheckHomography,
    src/Initializer.cc:266-329), th = 5.991."""
    inv_s2 = 1.0 / (SIGMA * SIGMA)
    Hinv = jnp.linalg.inv(H)
    e12 = jnp.sum((_apply_h(Hinv, xy2) - xy1) ** 2, axis=-1) * inv_s2
    e21 = jnp.sum((_apply_h(H, xy1) - xy2) ** 2, axis=-1) * inv_s2
    ok1 = e12 < TH_H
    ok2 = e21 < TH_H
    score = jnp.where(ok1 & valid, TH_H - e12, 0.0) + jnp.where(
        ok2 & valid, TH_H - e21, 0.0
    )
    return jnp.sum(score), ok1 & ok2 & valid


def _check_rt(R, t, K, xy1, xy2, valid, th2: float = 4.0):
    """Count/collect good triangulations for a motion hypothesis
    (reference CheckRT, src/Initializer.cc:798-908)."""
    T1 = jnp.eye(4, dtype=jnp.float32)
    T2 = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
    P1 = triangulate.projection_matrix(K, T1)
    P2 = triangulate.projection_matrix(K, T2)
    X = triangulate.triangulate_dlt(P1, P2, xy1, xy2)
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    z1, z2, cosp = triangulate.cheirality_and_parallax(X, T1, T2)
    # Reprojection errors.
    def reproj(P, X, xy):
        Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=-1)
        p = Xh @ P.T
        uv = p[:, :2] / jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
        return jnp.sum((uv - xy) ** 2, axis=-1)

    e1 = reproj(P1, X, xy1)
    e2 = reproj(P2, X, xy2)
    good_parallax = cosp < 0.99998
    good = (
        valid & finite & (z1 > 0) & (z2 > 0) & good_parallax
        & (e1 < th2) & (e2 < th2)
    )
    # Parallax statistic: the reference takes the min(50, n_good)-th
    # smallest cosParallax among good points (src/Initializer.cc:888-895).
    # Sort ascending with non-good pushed to the end, then index.
    cosp_sorted = jnp.sort(jnp.where(good, cosp, 2.0))
    n_good = jnp.sum(good)
    stat_idx = jnp.clip(jnp.minimum(50, n_good) - 1, 0, cosp.shape[0] - 1)
    parallax_cos = jnp.minimum(cosp_sorted[stat_idx], 1.0)
    return n_good, good, X, parallax_cos


def _motions_from_f(F, K):
    """E = K2ᵀ F K1; SVD -> 4 (R,t) candidates (reference
    DecomposeE + ReconstructF, src/Initializer.cc:470-571, 909-931)."""
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _motions_from_h(H, K):
    """Faugeras SVD decomposition of A = K⁻¹ H K into 8 motions
    (reference ReconstructH, src/Initializer.cc:572-733)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))
    eps = jnp.array([1.0, -1.0], jnp.float32)

    Rs, ts = [], []
    # Case d' = d2 (sin>0): 4 sign combinations.
    st_base = (d1 - d3) * x1 * x3 / jnp.maximum(d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum(d2 * (d1 + d3), 1e-12)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * st_base
            Rp = jnp.array(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
            )
            Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st)
            Rp = Rp.at[2, 0].set(st).at[2, 2].set(ct)
            tp = jnp.array([e1 * x1, 0.0, -e3 * x3], jnp.float32) * (d1 - d3)
            R = s * U @ Rp @ Vt
            t = (U @ tp)
            Rs.append(R)
            ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # Case d' = -d2 (cos<0): 4 more.
    sp_base = (d1 + d3) * x1 * x3 / jnp.maximum(d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum(d2 * (d1 - d3), 1e-12)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            sp = e1 * e3 * sp_base
            Rp = jnp.zeros((3, 3), jnp.float32)
            Rp = Rp.at[0, 0].set(cp).at[0, 2].set(sp)
            Rp = Rp.at[1, 1].set(-1.0)
            Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cp)
            tp = jnp.array([e1 * x1, 0.0, e3 * x3], jnp.float32) * (d1 + d3)
            R = s * U @ Rp @ Vt
            t = (U @ tp)
            Rs.append(R)
            ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def initialize_two_view(
    xy1,
    xy2,
    valid,
    K,
    key,
    n_hypotheses: int = 200,
    min_parallax_deg: float = 1.0,
    min_triangulated: int = 50,
) -> InitResult:
    """Full two-view bootstrap on matched undistorted coords (M,2)."""
    M = xy1.shape[0]
    n_valid = jnp.sum(valid)
    xy1n, T1 = _normalize(xy1, valid)
    xy2n, T2 = _normalize(xy2, valid)

    # Random 8-point minimal sets biased to valid entries (reference draws
    # from vAllIndices, src/Initializer.cc:78-102). With padded arrays we
    # draw from the full range and rely on scoring to reject bad models
    # fed by padded (invalid) rows: instead, draw by sorting random keys
    # with -inf on invalid rows so only valid indices are chosen.
    def draw(k):
        r = jax.random.uniform(k, (M,))
        r = jnp.where(valid, r, -1.0)
        return jnp.argsort(-r)[:8]

    keys = jax.random.split(key, n_hypotheses)
    sets = jax.vmap(draw)(keys)  # (NH,8)

    def eval_f(idx):
        F_n = _fit_f(xy1n[idx], xy2n[idx])
        F = T2.T @ F_n @ T1
        F = F / jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1.0, F[2, 2])
        score, _ = _score_f(F, xy1, xy2, valid)
        return score, F

    def eval_h(idx):
        H_n = _fit_h(xy1n[idx], xy2n[idx])
        H = jnp.linalg.inv(T2) @ H_n @ T1
        score, _ = _score_h(H, xy1, xy2, valid)
        return score, H

    sf, Fs = jax.vmap(eval_f)(sets)
    sh, Hs = jax.vmap(eval_h)(sets)
    best_f = jnp.argmax(sf)
    best_h = jnp.argmax(sh)
    F = Fs[best_f]
    H = Hs[best_h]
    _, inliers_f = _score_f(F, xy1, xy2, valid)
    _, inliers_h = _score_h(H, xy1, xy2, valid)

    # Two rounds of all-inlier refit (weighted least squares on the
    # normalized coordinates) — tightens the model well beyond the
    # minimal-set estimate before reconstruction.
    for _ in range(2):
        F_n = _fit_f(xy1n, xy2n, inliers_f.astype(jnp.float32))
        F = T2.T @ F_n @ T1
        _, inliers_f = _score_f(F, xy1, xy2, valid)
        H_n = _fit_h(xy1n, xy2n, inliers_h.astype(jnp.float32))
        H = jnp.linalg.inv(T2) @ H_n @ T1
        _, inliers_h = _score_h(H, xy1, xy2, valid)
    SF, _ = _score_f(F, xy1, xy2, valid)
    SH, _ = _score_h(H, xy1, xy2, valid)

    rh = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = rh > 0.40  # reference src/Initializer.cc:117

    Rs_f, ts_f = _motions_from_f(F, K)
    Rs_h, ts_h = _motions_from_h(H, K)
    # Evaluate both banks; select with use_h.
    check = lambda R, t, inl: _check_rt(R, t, K, xy1, xy2, inl)
    ng_f, good_f, X_f, par_f = jax.vmap(check, in_axes=(0, 0, None))(Rs_f, ts_f, inliers_f)
    ng_h, good_h, X_h, par_h = jax.vmap(check, in_axes=(0, 0, None))(Rs_h, ts_h, inliers_h)

    def select(ngs, goods, Xs, pars, Rb, tb, inl, n_cand):
        best = jnp.argmax(ngs)
        max_good = ngs[best]
        n_inl = jnp.sum(inl)
        n_similar = jnp.sum(ngs > 0.7 * max_good)
        parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(pars[best], -1.0, 1.0)))
        ok = (
            (max_good > 0.9 * n_inl)
            & (n_similar == 1)
            & (parallax_deg > min_parallax_deg)
            & (max_good >= min_triangulated)
        )
        return ok, Rb[best], tb[best], Xs[best], goods[best]

    ok_f, R_f, t_f, Xb_f, gb_f = select(ng_f, good_f, X_f, par_f, Rs_f, ts_f, inliers_f, 4)
    ok_h, R_h, t_h, Xb_h, gb_h = select(ng_h, good_h, X_h, par_h, Rs_h, ts_h, inliers_h, 8)

    success = jnp.where(use_h, ok_h, ok_f) & (n_valid >= 8)
    R = jnp.where(use_h, R_h, R_f)
    t = jnp.where(use_h, t_h, t_f)
    X = jnp.where(use_h, Xb_h, Xb_f)
    is_pt = jnp.where(use_h, gb_h, gb_f)
    return InitResult(
        success=success, R=R, t=t, points=X, is_point=is_pt, used_homography=use_h
    )
