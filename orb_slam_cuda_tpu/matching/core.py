"""Core batched-matching primitives shared by all search strategies.

Replaces the scalar machinery every `ORBmatcher::Search*` in the reference
is built from (reference: src/ORBmatcher.cc): best/second-best Hamming
scan per query, the ratio test, the 30-bin rotation-consistency histogram
(`ComputeThreeMaxima`, src/ORBmatcher.cc:1624-1646) and last-wins
duplicate suppression — all as dense masked (Q,D) array ops. The
reference's 64x48 per-frame grid (`Frame::GetFeaturesInArea`,
src/Frame.cc:326-380) exists to prune the CPU scan; on TPU the full
distance matrix is a single MXU matmul, so the spatial window becomes a
mask instead of an index structure.
"""

from __future__ import annotations

import jax.numpy as jnp

INF = jnp.float32(3.0e4)
TH_HIGH = 100  # reference src/ORBmatcher.cc:37
TH_LOW = 50  # reference src/ORBmatcher.cc:38
HISTO_LENGTH = 30  # reference src/ORBmatcher.cc:39


def best_two(dist, gate):
    """Per-row best and second-best over gated columns.

    Args:
      dist: (Q,D) float32 distances.
      gate: (Q,D) bool admissible pairs.

    Returns:
      best_idx (Q,) int32; best (Q,) f32; second (Q,) f32 (INF if <2
      candidates); second_idx (Q,) int32.
    """
    d = jnp.where(gate, dist.astype(jnp.float32), INF)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    cols = jnp.arange(d.shape[1], dtype=jnp.int32)
    d_wo_best = jnp.where(cols[None, :] == best_idx[:, None], INF, d)
    second_idx = jnp.argmin(d_wo_best, axis=1).astype(jnp.int32)
    second = jnp.min(d_wo_best, axis=1)
    return best_idx, best, second, second_idx


def rotation_consistency(rot_deg, valid, histo_length: int = HISTO_LENGTH,
                         keep_top: int = 3):
    """Keep only matches whose orientation difference falls in the
    `keep_top` most populated of `histo_length` bins (reference:
    rotation histogram built in each Search* + ComputeThreeMaxima,
    src/ORBmatcher.cc:1624-1646, including its <0.1/0.15 max-ratio
    bin-suppression rules).

    Args:
      rot_deg: (Q,) angle differences in degrees (any range).
      valid: (Q,) bool current match validity.

    Returns:
      (Q,) bool refined validity.
    """
    factor = histo_length / 360.0
    b = jnp.round(rot_deg * factor).astype(jnp.int32)
    b = jnp.where(b == histo_length, 0, b)
    b = jnp.mod(b, histo_length)
    hist = jnp.sum(
        jnp.where(valid[:, None], (b[:, None] == jnp.arange(histo_length)[None, :]), False),
        axis=0,
    )
    order = jnp.argsort(-hist)
    max1 = hist[order[0]].astype(jnp.float32)
    keep_bins = order[:keep_top]
    keep_counts = hist[keep_bins].astype(jnp.float32)
    # Reference drops bin 2 if < 0.1*max1 and bin 3 if < 0.15... (actual
    # thresholds: ind2 kept if >0.1*max1? ComputeThreeMaxima zeroes ind2 when
    # max2 < 0.1*max1 and ind3 when max3 < 0.1*max1).
    bin_ok = keep_counts >= 0.1 * max1
    bin_ok = bin_ok.at[0].set(True)
    match_bin_ok = jnp.any(
        (b[:, None] == keep_bins[None, :]) & bin_ok[None, :], axis=1
    )
    return valid & match_bin_ok


def resolve_duplicate_targets(target_idx, dist, valid, n_targets: int):
    """Ensure each target is claimed by at most one query (the reference
    walks matches erasing previous claims, e.g. SearchByProjection reloc
    src/ORBmatcher.cc:1472-1601); keep the lowest-distance claimant,
    breaking ties by query index.

    Args:
      target_idx: (Q,) int32 proposed target per query (-1/garbage where
        ~valid).
      dist: (Q,) f32 distances. valid: (Q,) bool. n_targets: static D.

    Returns:
      (Q,) bool validity with duplicate claims suppressed.
    """
    q = jnp.arange(target_idx.shape[0], dtype=jnp.float32)
    # Composite key: distance first, then query index (strictly increasing).
    key = dist * 1e6 + q
    key = jnp.where(valid, key, jnp.inf)
    tgt = jnp.where(valid, target_idx, n_targets)  # park invalid in overflow bin
    best_key = (
        jnp.full((n_targets + 1,), jnp.inf, jnp.float32).at[tgt].min(key)
    )
    return valid & (key <= best_key[tgt])
