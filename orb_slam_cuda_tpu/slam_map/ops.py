"""Batched map operations: covisibility, point statistics, culling.

Everything the reference computes by walking `KeyFrame*`/`MapPoint*`
pointers becomes segment-sums and matmuls over the (K,N) observation
table `kf_mp`:

  * covisibility weights (reference: `KeyFrame::UpdateConnections`
    src/KeyFrame.cc:298-388 — per-pair shared-point counting via std::map)
    -> an observation-incidence matmul on the MXU;
  * distinctive descriptors (`MapPoint::ComputeDistinctiveDescriptors`
    src/MapPoint.cc:247-313 — per-point pairwise Hamming + min median)
    -> per-point bit-mean + closest-observation selection via segment ops
    (min-mean-distance instead of min-median: same robust-medoid intent,
    fully parallel);
  * normals/depth bounds (`MapPoint::UpdateNormalAndDepth`
    src/MapPoint.cc:335-377) -> segment means;
  * culling rules (`LocalMapping::MapPointCulling` :197-235,
    `KeyFrameCulling` :668-736) -> vectorized predicates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import hamming
from .state import MapConfig, MapState


def _obs_valid(state: MapState):
    """(K,N) bool: genuine observations (valid KF row, bound point)."""
    return (state.kf_mp >= 0) & state.kf_valid[:, None]


@jax.jit
def observation_counts(state: MapState):
    """(P,) int32 — observations per map point (MapPoint::Observations)."""
    P = state.mp_xyz.shape[0]
    ov = _obs_valid(state)
    seg = jnp.clip(state.kf_mp, 0)
    return (
        jnp.zeros((P,), jnp.int32)
        .at[seg.reshape(-1)]
        .add(ov.reshape(-1).astype(jnp.int32))
    )


@jax.jit
def observation_matrix(state: MapState, dtype=jnp.bfloat16):
    """(K,P) incidence matrix (1 = kf observes point).

    SCALE WARNING: materializes K*P — fine for unit-test capacities,
    but hot paths must not call this on grown maps (1024 KF x 131k pts
    = 0.25 GB bf16 per dispatch). `covisibility_matrix` tiles over
    points instead of going through this."""
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    ov = _obs_valid(state)
    seg = jnp.clip(state.kf_mp, 0)
    obs = jnp.zeros((K, P), dtype)
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    return obs.at[rows.reshape(-1), seg.reshape(-1)].add(
        ov.reshape(-1).astype(dtype)
    )


_COVIS_TILE = 16384  # (K, TILE) slab = 32 MB bf16 at K=1024


@jax.jit
def covisibility_matrix(state: MapState):
    """(K,K) int32 shared-point counts, diagonal zeroed. MXU matmuls
    replace the reference's per-keyframe map<KeyFrame*,int> accumulation
    (src/KeyFrame.cc:310-330).

    The (K,P) incidence is never materialized: the P axis is processed
    in static tiles (one scatter + one A@A.T per tile, accumulated into
    the (K,K) result), so peak memory is K*TILE regardless of map
    growth. Maps at the default 16k-point capacity take the single-tile
    fast path, which compiles to exactly the untiled program."""
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    tile = min(P, _COVIS_TILE)
    n_tiles = -(-P // tile)
    ov = _obs_valid(state)
    seg = jnp.clip(state.kf_mp, 0)
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N)).reshape(-1)

    def accumulate(acc, base):
        local = seg - base
        in_tile = ov & (local >= 0) & (local < tile)
        A = jnp.zeros((K, tile), jnp.bfloat16).at[
            rows, jnp.clip(local, 0, tile - 1).reshape(-1)
        ].add(in_tile.reshape(-1).astype(jnp.bfloat16))
        return acc + jax.lax.dot_general(
            A, A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    init = jnp.zeros((K, K), jnp.float32)
    if n_tiles == 1:
        w = accumulate(init, 0)
    else:
        w, _ = jax.lax.scan(
            lambda acc, t: (accumulate(acc, t * tile), None),
            init, jnp.arange(n_tiles),
        )
    w = w.astype(jnp.int32)
    w = w * (1 - jnp.eye(K, dtype=jnp.int32))
    valid2 = state.kf_valid[:, None] & state.kf_valid[None, :]
    return jnp.where(valid2, w, 0)


@jax.jit
def refresh_covis_rows(state: MapState, kf_ids) -> MapState:
    """Recompute the incremental covisibility rows/columns for `kf_ids`
    ((M,) int32, -1 padded) from the observation table — the engine's
    UpdateConnections (reference src/KeyFrame.cc:298-388), called at
    keyframe-rate events (insertion, triangulation+fusion, loop
    correction); `state.covis` is read for free everywhere else."""
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    ov = _obs_valid(state)
    seg = jnp.clip(state.kf_mp, 0)

    def one_row(k):
        safe = jnp.clip(k, 0)
        row_mp = state.kf_mp[safe]
        # Order-independent membership scatter: .max never lets a pad
        # (-1 clipped to 0, value False) clobber a genuine observation
        # of point 0 the way duplicate-index .set could.
        sel = jnp.zeros((P,), bool).at[jnp.clip(row_mp, 0)].max(
            (row_mp >= 0) & state.kf_feat_valid[safe]
        )
        hit = ov & sel[seg]
        w = jnp.sum(hit, axis=1).astype(jnp.int32)
        w = jnp.where(state.kf_valid & state.kf_valid[safe], w, 0)
        return w.at[safe].set(0)  # diagonal zero

    rows = jax.vmap(one_row)(kf_ids)  # (M,K)
    # Pad entries (-1) must not touch the matrix at all: route them to an
    # out-of-bounds sentinel row K and let mode='drop' discard them.
    # (Negative indices WRAP in JAX scatters even under mode='drop', so a
    # raw -1 would silently hit the last slot.)
    idx = jnp.where(kf_ids >= 0, kf_ids, K)
    covis = state.covis
    covis = covis.at[idx, :].set(rows, mode='drop')
    covis = covis.at[:, idx].set(rows.T, mode='drop')
    return state._replace(covis=covis)


@jax.jit
def covisibility_counts_for_bindings(state: MapState, point_ids):
    """(K,) int32 — how many of `point_ids` ((M,) int32, -1 padded) each
    keyframe observes. The cheap one-row covisibility used by
    `Tracking::UpdateLocalKeyFrames` (reference src/Tracking.cc:1291-1355)
    without materializing the full matrix."""
    P = state.mp_xyz.shape[0]
    sel = jnp.zeros((P,), bool).at[jnp.clip(point_ids, 0)].max(point_ids >= 0)
    ov = _obs_valid(state)
    hit = ov & sel[jnp.clip(state.kf_mp, 0)]
    return jnp.sum(hit, axis=1).astype(jnp.int32)


@jax.jit
def points_of_keyframes(state: MapState, kf_mask):
    """(P,) bool — union of points observed by masked keyframes
    (the local-map point set, reference src/Tracking.cc:1356-1382)."""
    P = state.mp_xyz.shape[0]
    ov = _obs_valid(state) & kf_mask[:, None]
    seg = jnp.clip(state.kf_mp, 0)
    sel = jnp.zeros((P,), bool).at[seg.reshape(-1)].max(ov.reshape(-1))
    return sel & state.mp_valid


@functools.partial(jax.jit, static_argnames=('cfg',))
def update_point_stats(state: MapState, cfg: MapConfig) -> MapState:
    """Recompute distinctive descriptors, normals and scale-distance
    bounds for all valid points from the observation table.

    Replaces per-point loops in MapPoint (reference src/MapPoint.cc:
    247-313, 335-377) with three segment passes over the E = K*N
    observation slots.
    """
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    ov = _obs_valid(state)
    flat_pt = jnp.clip(state.kf_mp, 0).reshape(-1)
    w = ov.reshape(-1).astype(jnp.float32)

    # --- distinctive descriptor: bit-mean then closest observation ---
    bits = hamming.unpack_bits(state.kf_desc.reshape(K * N, 8)).astype(jnp.float32)
    sum_bits = jnp.zeros((P, hamming.N_BITS), jnp.float32).at[flat_pt].add(bits * w[:, None])
    cnt = jnp.zeros((P,), jnp.float32).at[flat_pt].add(w)
    mean_bip = (sum_bits / jnp.maximum(cnt, 1.0)[:, None]) * 2.0 - 1.0  # (P,256)
    obs_bip = bits * 2.0 - 1.0
    score = jnp.sum(obs_bip * mean_bip[flat_pt], axis=-1)  # (E,)
    score = jnp.where(ov.reshape(-1), score, -jnp.inf)
    best_score = jnp.full((P,), -jnp.inf).at[flat_pt].max(score)
    is_best = score >= best_score[flat_pt]
    # Tie-break to the lowest observation slot.
    e_idx = jnp.arange(K * N, dtype=jnp.float32)
    cand = jnp.where(is_best & ov.reshape(-1), e_idx, jnp.inf)
    best_e = jnp.full((P,), jnp.inf).at[flat_pt].min(cand)
    has_obs = cnt > 0
    best_e_i = jnp.clip(best_e, 0, K * N - 1).astype(jnp.int32)
    new_desc = jnp.where(
        has_obs[:, None], state.kf_desc.reshape(K * N, 8)[best_e_i], state.mp_desc
    )

    # --- normal: mean unit vector from observing camera centers ---
    R = state.kf_pose[:, :3, :3]
    t = state.kf_pose[:, :3, 3]
    centers = -jnp.einsum("kij,ki->kj", R.transpose(0, 2, 1), t)  # (K,3)
    centers_e = jnp.repeat(centers, N, axis=0)  # (E,3)
    vec = state.mp_xyz[flat_pt] - centers_e
    vec = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-9)
    sum_n = jnp.zeros((P, 3), jnp.float32).at[flat_pt].add(vec * w[:, None])
    normal = sum_n / jnp.maximum(jnp.linalg.norm(sum_n, axis=-1, keepdims=True), 1e-9)
    new_normal = jnp.where(has_obs[:, None], normal, state.mp_normal)

    # --- reference-keyframe repair: if a point's ref KF was culled,
    # reassign to its lowest-index observing keyframe (the reference
    # reassigns mpRefKF inside EraseObservation, src/MapPoint.cc:121-143)
    kf_of_e_f = jnp.repeat(jnp.arange(K, dtype=jnp.float32), N)
    min_obs_kf = jnp.full((P,), jnp.inf).at[flat_pt].min(
        jnp.where(ov.reshape(-1), kf_of_e_f, jnp.inf)
    )
    ref_invalid = ~state.kf_valid[jnp.clip(state.mp_ref_kf, 0)] | (state.mp_ref_kf < 0)
    new_ref = jnp.where(
        ref_invalid & has_obs,
        jnp.clip(min_obs_kf, 0, K - 1).astype(jnp.int32),
        state.mp_ref_kf,
    )
    state = state._replace(mp_ref_kf=new_ref)

    # --- scale-distance bounds from the reference keyframe observation ---
    ref = jnp.clip(state.mp_ref_kf, 0)
    ref_center = centers[ref]  # (P,3)
    dist = jnp.linalg.norm(state.mp_xyz - ref_center, axis=-1)
    kf_of_e = jnp.repeat(jnp.arange(K), N)
    is_ref_obs = ov.reshape(-1) & (kf_of_e == ref[flat_pt])
    oct_e = state.kf_oct.reshape(-1).astype(jnp.float32)
    ref_oct = jnp.zeros((P,), jnp.float32).at[flat_pt].max(
        jnp.where(is_ref_obs, oct_e, -jnp.inf)
    )
    ref_oct = jnp.clip(ref_oct, 0, cfg.n_levels - 1)
    level_scale = cfg.scale_factor**ref_oct
    max_dist = dist * level_scale
    min_dist = max_dist / (cfg.scale_factor ** (cfg.n_levels - 1))
    new_max = jnp.where(has_obs, max_dist, state.mp_max_dist)
    new_min = jnp.where(has_obs, min_dist, state.mp_min_dist)

    return state._replace(
        mp_desc=new_desc,
        mp_normal=new_normal,
        mp_max_dist=new_max,
        mp_min_dist=new_min,
    )


@functools.partial(jax.jit, static_argnames=('min_found_ratio','th_obs'))
def cull_points(
    state: MapState,
    probation_mask,
    age,
    min_found_ratio: float = 0.25,
    th_obs: int = 2,
):
    """Recent-point culling mask (reference `LocalMapping::MapPointCulling`
    src/LocalMapping.cc:197-235): drop probation points whose
    found/visible ratio is low, or that gathered too few observations
    within 2 keyframes of creation.

    Args:
      probation_mask: (P,) bool — the engine's recent-point list (the
        reference's mlpRecentAddedMapPoints), maintained host-side so
        keyframe-slot recycling can't alias point ages.
      age: (P,) int32 keyframes elapsed since each point's creation
        (garbage outside probation_mask).
      th_obs: 2 mono / 3 stereo (reference cnThObs).

    Returns: (P,) bool — points to erase.
    """
    obs = observation_counts(state)
    ratio_bad = state.mp_found / jnp.maximum(state.mp_visible, 1.0) < min_found_ratio
    few_obs_bad = (age >= 2) & (obs <= th_obs)
    return probation_mask & state.mp_valid & (ratio_bad | few_obs_bad)


@functools.partial(jax.jit, static_argnames=('th_scale_slack',))
def keyframe_redundancy(state: MapState, kf_slot, th_scale_slack: int = 1):
    """Fraction of this keyframe's tracked points that are redundantly
    observed (≥3 other keyframes at equal-or-finer scale) — the ≥90%
    culling rule of `LocalMapping::KeyFrameCulling` (reference
    src/LocalMapping.cc:668-736).
    """
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    row_mp = state.kf_mp[kf_slot]  # (N,)
    row_valid = row_mp >= 0
    row_oct = state.kf_oct[kf_slot]
    # For each point of this KF: its required scale ceiling.
    oct_ceiling = jnp.zeros((P,), jnp.int32).at[jnp.clip(row_mp, 0)].max(
        jnp.where(row_valid, row_oct + th_scale_slack, 0)
    )
    in_row = jnp.zeros((P,), bool).at[jnp.clip(row_mp, 0)].max(row_valid)
    ov = _obs_valid(state)
    seg = jnp.clip(state.kf_mp, 0)
    counted = (
        ov
        & in_row[seg]
        & (state.kf_oct <= oct_ceiling[seg])
        & (jnp.arange(K)[:, None] != kf_slot)
    )
    per_point = jnp.zeros((P,), jnp.int32).at[seg.reshape(-1)].add(
        counted.reshape(-1).astype(jnp.int32)
    )
    redundant = in_row & (per_point >= 3)
    n_pts = jnp.sum(in_row)
    return jnp.sum(redundant) / jnp.maximum(n_pts, 1)


@jax.jit
def sanitize_bindings(state: MapState, mp):
    """Drop bindings to invalid point slots (reference
    Tracking::CheckReplacedInLastFrame + MapPoint::isBad checks,
    src/Tracking.cc:330-345): frame binding vectors computed against an
    older map state may reference points the mapper has since culled or
    merged away."""
    return jnp.where((mp >= 0) & state.mp_valid[jnp.clip(mp, 0)], mp, -1)


@jax.jit
def increase_visible(state: MapState, point_ids, amount=None) -> MapState:
    """mp_visible += 1 for ids (−1 padded); reference MapPoint::IncreaseVisible."""
    sel = point_ids >= 0
    add = sel.astype(jnp.float32) if amount is None else jnp.where(sel, amount, 0.0)
    return state._replace(
        mp_visible=state.mp_visible.at[jnp.clip(point_ids, 0)].add(add)
    )


@jax.jit
def increase_found(state: MapState, point_ids, amount=None) -> MapState:
    sel = point_ids >= 0
    add = sel.astype(jnp.float32) if amount is None else jnp.where(sel, amount, 0.0)
    return state._replace(
        mp_found=state.mp_found.at[jnp.clip(point_ids, 0)].add(add)
    )


def top_covisible(covis_row, n: int):
    """Indices of the n largest-weight covisible keyframes (weight>0
    first; padded with -1, and always (n,)-shaped even when the keyframe
    capacity is below n — small pre-growth maps). Replaces
    GetBestCovisibilityKeyFrames (reference src/KeyFrame.cc:169-183)."""
    k = min(n, covis_row.shape[-1])
    w, idx = jax.lax.top_k(covis_row, k)
    out = jnp.where(w > 0, idx.astype(jnp.int32), -1)
    if k < n:
        pad_shape = out.shape[:-1] + (n - k,)
        out = jnp.concatenate([out, jnp.full(pad_shape, -1, jnp.int32)], axis=-1)
    return out
