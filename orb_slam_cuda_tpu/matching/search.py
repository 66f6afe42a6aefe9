"""The ORBmatcher search strategies as batched masked-matmul matches.

Each function mirrors one family from the reference's `src/ORBmatcher.cc`
(cited per function) but is reformulated dense: build a (Q,D) Hamming
matrix on the MXU, AND together the geometric/pyramid/BoW gates as masks,
then run best-two + ratio + rotation-consistency + duplicate resolution
from `matching.core`. All inputs are fixed-capacity arrays with validity
masks; outputs are per-query target indices (-1 = unmatched).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import hamming
from . import core


class MatchResult(NamedTuple):
    idx: jnp.ndarray  # (Q,) int32 matched target index or -1
    dist: jnp.ndarray  # (Q,) float32 Hamming distance (INF if unmatched)

    @property
    def valid(self):
        return self.idx >= 0

    def count(self):
        return jnp.sum(self.idx >= 0)


def _finalize(best_idx, best, gate_ok, n_targets, resolve=True):
    valid = gate_ok & (best < core.INF)
    if resolve:
        valid = core.resolve_duplicate_targets(best_idx, best, valid, n_targets)
    idx = jnp.where(valid, best_idx, -1)
    dist = jnp.where(valid, best, core.INF)
    return MatchResult(idx=idx, dist=dist)


def by_projection(
    q_uv, q_bip, q_valid, q_pred_octave,
    t_uv, t_oct, t_ang, t_bip, t_valid,
    scale_factors,
    radius: float,
    q_ang=None,
    max_dist: float = core.TH_HIGH,
    ratio: float = 0.9,
    octave_lo_off: int = -1,
    octave_hi_off: int = 1,
    ratio_same_level_only: bool = True,
    check_rotation: bool = False,
    t_has_point=None,
    q_radius_scale=None,
):
    """Generic projection-window search.

    Covers `SearchByProjection` map-point→frame (reference:
    src/ORBmatcher.cc:45-130: window r*scale[predLevel], levels
    [pred-1,pred+1], ratio applied only when best/second share a level) and
    frame→frame motion-model matching (src/ORBmatcher.cc:1328-1471:
    window th*scale[last octave], rotation histogram, +forward/backward
    level gate), depending on the arguments.

    Args:
      q_uv: (Q,2) predicted projections of the queries (map points or last
        frame's features) in the target image.
      q_bip: (Q,256) bipolar descriptors of queries.
      q_pred_octave: (Q,) predicted pyramid level (scale prediction).
      t_*: target frame feature arrays ((D,…)).
      radius: base window radius in pixels (2.5/4.0/th per reference call
        site), scaled by scale_factors[q_pred_octave].
      q_ang: (Q,) query angles in degrees, required if check_rotation.
      t_has_point: (D,) bool — targets already bound to a map point are
        excluded (reference skips features with existing MapPoint
        observations, src/ORBmatcher.cc:87-89).
    """
    sf = jnp.asarray(scale_factors, jnp.float32)
    r = radius * sf[jnp.clip(q_pred_octave, 0, sf.shape[0] - 1)]  # (Q,)
    if q_radius_scale is not None:
        r = r * q_radius_scale
    du = jnp.abs(q_uv[:, 0:1] - t_uv[None, :, 0])
    dv = jnp.abs(q_uv[:, 1:2] - t_uv[None, :, 1])
    window = (du <= r[:, None]) & (dv <= r[:, None])
    oct_lo = q_pred_octave[:, None] + octave_lo_off
    oct_hi = q_pred_octave[:, None] + octave_hi_off
    octave_ok = (t_oct[None, :] >= oct_lo) & (t_oct[None, :] <= oct_hi)
    gate = window & octave_ok & q_valid[:, None] & t_valid[None, :]
    if t_has_point is not None:
        gate = gate & ~t_has_point[None, :]

    dist = hamming.hamming_matrix(q_bip, t_bip).astype(jnp.float32)
    best_idx, best, second, second_idx = core.best_two(dist, gate)

    ok = best <= max_dist
    best_lvl = t_oct[best_idx]
    second_lvl = t_oct[second_idx]
    if ratio_same_level_only:
        ratio_applies = (best_lvl == second_lvl) & (second < core.INF)
    else:
        ratio_applies = second < core.INF
    ok = ok & ~(ratio_applies & (best > ratio * second))

    if check_rotation:
        rot = q_ang - t_ang[best_idx]
        ok = ok & core.rotation_consistency(rot, ok)

    return _finalize(best_idx, best, ok, t_uv.shape[0])


def for_initialization(
    f1_uv, f1_bip, f1_valid, f1_ang,
    f2_uv, f2_bip, f2_valid, f2_ang, f2_oct,
    f1_oct,
    window: float = 100.0,
    ratio: float = 0.9,
    max_dist: float = core.TH_LOW,
):
    """Monocular-initialization matching (reference:
    `SearchForInitialization` src/ORBmatcher.cc:405-521): level-0 features
    only, square window around the feature's own location, TH_LOW, ratio,
    rotation histogram, duplicate suppression."""
    du = jnp.abs(f1_uv[:, 0:1] - f2_uv[None, :, 0])
    dv = jnp.abs(f1_uv[:, 1:2] - f2_uv[None, :, 1])
    gate = (
        (du <= window) & (dv <= window)
        & f1_valid[:, None] & f2_valid[None, :]
        & (f1_oct[:, None] == 0) & (f2_oct[None, :] == 0)
    )
    dist = hamming.hamming_matrix(f1_bip, f2_bip).astype(jnp.float32)
    best_idx, best, second, _ = core.best_two(dist, gate)
    ok = (best <= max_dist) & (best <= ratio * second)
    rot = f1_ang - f2_ang[best_idx]
    ok = ok & core.rotation_consistency(rot, ok)
    return _finalize(best_idx, best, ok, f2_uv.shape[0])


def by_bow(
    f1_nodes, f1_bip, f1_valid, f1_ang,
    f2_nodes, f2_bip, f2_valid, f2_ang,
    ratio: float = 0.7,
    max_dist: float = core.TH_LOW,
    check_rotation: bool = True,
    f1_has_point=None,
    f2_has_point=None,
):
    """BoW-bucketed matching (reference: `SearchByBoW` KF↔Frame
    src/ORBmatcher.cc:159-289 and KF↔KF :522-656): candidates must share
    the vocabulary node at levelsup (the FeatureVector bucket); TH_LOW,
    ratio 0.7/0.75, rotation histogram.

    f1_has_point: restrict queries to features WITH map points (KF side);
    f2_has_point: exclude targets already bound (frame side)."""
    gate = (
        (f1_nodes[:, None] == f2_nodes[None, :])
        & f1_valid[:, None] & f2_valid[None, :]
    )
    if f1_has_point is not None:
        gate = gate & f1_has_point[:, None]
    if f2_has_point is not None:
        gate = gate & ~f2_has_point[None, :]
    dist = hamming.hamming_matrix(f1_bip, f2_bip).astype(jnp.float32)
    best_idx, best, second, _ = core.best_two(dist, gate)
    ok = (best <= max_dist) & (best <= ratio * second)
    if check_rotation:
        rot = f1_ang - f2_ang[best_idx]
        ok = ok & core.rotation_consistency(rot, ok)
    return _finalize(best_idx, best, ok, f2_nodes.shape[0])


def for_triangulation(
    f1_nodes, f1_bip, f1_valid, f1_ang, f1_uv, f1_oct,
    f2_nodes, f2_bip, f2_valid, f2_ang, f2_uv, f2_oct,
    F12,
    level_sigma2,
    epipole_uv=None,
    scale_factors=None,
    ratio: float = 1.0,
    max_dist: float = core.TH_LOW,
    check_rotation: bool = True,
    f1_has_point=None,
    f2_has_point=None,
):
    """Epipolar-constrained matching for new-point triangulation
    (reference: `SearchForTriangulation` src/ORBmatcher.cc:657-824): BoW
    node gate + distance-to-epipolar-line < 3.84*sigma2[octave2] + an
    epipole proximity rejection in the mono case; only features without
    map points participate."""
    from ..geometry.triangulate import epipolar_distance_sq

    gate = (
        (f1_nodes[:, None] == f2_nodes[None, :])
        & f1_valid[:, None] & f2_valid[None, :]
    )
    if f1_has_point is not None:
        gate = gate & ~f1_has_point[:, None]
    if f2_has_point is not None:
        gate = gate & ~f2_has_point[None, :]

    # Epipolar gate: for each (i,j), distance of f2_j to line of f1_i.
    # epipolar_distance_sq supports broadcasting over a (Q,D,2) pairing.
    q_uv = jnp.broadcast_to(f1_uv[:, None, :], (f1_uv.shape[0], f2_uv.shape[0], 2))
    t_uv = jnp.broadcast_to(f2_uv[None, :, :], (f1_uv.shape[0], f2_uv.shape[0], 2))
    d2 = epipolar_distance_sq(F12, q_uv, t_uv)  # (Q,D)
    sig2 = jnp.asarray(level_sigma2, jnp.float32)[jnp.clip(f2_oct, 0, len(level_sigma2) - 1)]
    gate = gate & (d2 < 3.84 * sig2[None, :])

    if epipole_uv is not None and scale_factors is not None:
        # Reject f2 features too close to the epipole (reference
        # src/ORBmatcher.cc:738-743: squared distance < 100*scale[octave],
        # i.e. a ~10px-radius exclusion, NOT a 100px one).
        sf = jnp.asarray(scale_factors, jnp.float32)[jnp.clip(f2_oct, 0, len(scale_factors) - 1)]
        de2 = jnp.sum((f2_uv - epipole_uv[None, :]) ** 2, axis=-1)
        gate = gate & (de2 >= 100.0 * sf)[None, :]

    dist = hamming.hamming_matrix(f1_bip, f2_bip).astype(jnp.float32)
    best_idx, best, second, _ = core.best_two(dist, gate)
    ok = best <= max_dist
    if ratio < 1.0:
        ok = ok & (best <= ratio * second)
    if check_rotation:
        rot = f1_ang - f2_ang[best_idx]
        ok = ok & core.rotation_consistency(rot, ok)
    return _finalize(best_idx, best, ok, f2_nodes.shape[0])


def fuse(
    p_uv, p_bip, p_valid, p_pred_octave,
    t_uv, t_oct, t_bip, t_valid,
    scale_factors,
    radius: float = 3.0,
    max_dist: float = core.TH_LOW,
):
    """Map-point fusion matching (reference: `ORBmatcher::Fuse`
    src/ORBmatcher.cc:825-1101): project points into a keyframe, window
    r*scale[predLevel], levels [pred-1, pred], accept under TH_LOW. The
    replace-or-add decision happens in the caller (map layer), which knows
    observation counts."""
    return by_projection(
        p_uv, p_bip, p_valid, p_pred_octave,
        t_uv, t_oct, jnp.zeros_like(t_uv[:, 0]), t_bip, t_valid,
        scale_factors,
        radius=radius,
        max_dist=max_dist,
        ratio=1.0,
        octave_lo_off=-1,
        octave_hi_off=1,
        ratio_same_level_only=True,
        check_rotation=False,
    )


def predict_octave(dist_to_point, max_distance, log_scale_factor, n_levels):
    """Scale prediction from map-point distance (reference:
    `MapPoint::PredictScale` src/MapPoint.cc:390-422):
    level = ceil(log(maxDist/dist)/log(scaleFactor)) clipped."""
    ratio = max_distance / jnp.maximum(dist_to_point, 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / log_scale_factor).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)
