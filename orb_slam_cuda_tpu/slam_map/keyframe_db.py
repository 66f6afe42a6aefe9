"""BoW keyframe database: inverted-file retrieval as dense array ops.

TPU-native replacement for the reference's `KeyFrameDatabase`
(reference: src/KeyFrameDatabase.cc): the `vector<list<KeyFrame*>>`
inverted file becomes per-keyframe compacted sparse BoW rows
(unique word ids + L1-normalized tf-idf weights, fixed capacity), and a
query becomes: scatter the query BoW into a dense (W,) vector, then score
all K keyframes with one gather + min + sum — no per-word list walking.
The candidate logic (common-word counting, 0.8·maxCommon cutoff,
covisibility-group score accumulation, 0.75·bestAcc gate) mirrors
`DetectLoopCandidates` (src/KeyFrameDatabase.cc:112-234) and
`DetectRelocalizationCandidates` (:235-347).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_PAD = jnp.int32(2**30)  # sort-to-the-end sentinel for invalid words


class BowDB(NamedTuple):
    """word: (K,B) int32 unique word ids (-1 pad); weight: (K,B) f32
    L1-normalized tf-idf; valid: (K,) bool."""

    word: jnp.ndarray
    weight: jnp.ndarray
    valid: jnp.ndarray


def empty(max_keyframes: int, bow_capacity: int) -> BowDB:
    return BowDB(
        word=jnp.full((max_keyframes, bow_capacity), -1, jnp.int32),
        weight=jnp.zeros((max_keyframes, bow_capacity), jnp.float32),
        valid=jnp.zeros((max_keyframes,), bool),
    )


@jax.jit
def compute_bow_row(word_ids, idf, feat_valid):
    """(N,) per-feature word ids + idf weights -> compacted unique
    (word_u, weight_u) rows, tf-idf accumulated and L1-normalized
    (DBoW2 TF_IDF semantics, TemplatedVocabulary.h transform)."""
    n = word_ids.shape[0]
    w = jnp.where(feat_valid & (word_ids >= 0), word_ids, _PAD)
    order = jnp.argsort(w)
    ws = w[order]
    idf_s = jnp.where(ws < _PAD, idf[order], 0.0)
    first = jnp.concatenate([jnp.array([True]), ws[1:] != ws[:-1]])
    group = jnp.cumsum(first) - 1  # compacted group index per sorted slot
    sums = jnp.zeros((n,), jnp.float32).at[group].add(idf_s)
    word_u = jnp.full((n,), -1, jnp.int32).at[group].max(jnp.where(ws < _PAD, ws, -1))
    total = jnp.sum(sums)
    weight_u = jnp.where(word_u >= 0, sums / jnp.maximum(total, 1e-12), 0.0)
    return word_u, weight_u


@jax.jit
def insert(db: BowDB, slot, word_u, weight_u) -> BowDB:
    return BowDB(
        word=db.word.at[slot].set(word_u),
        weight=db.weight.at[slot].set(weight_u),
        valid=db.valid.at[slot].set(True),
    )


def grow(db: BowDB, new_K: int) -> BowDB:
    """Pad the database to new_K keyframe rows (mirrors
    state.grow_keyframes)."""
    K_old = db.valid.shape[0]
    if new_K <= K_old:
        return db
    pad = new_K - K_old
    B = db.word.shape[1]
    return BowDB(
        word=jnp.concatenate([db.word, jnp.full((pad, B), -1, jnp.int32)]),
        weight=jnp.concatenate([db.weight, jnp.zeros((pad, B), jnp.float32)]),
        valid=jnp.concatenate([db.valid, jnp.zeros((pad,), bool)]),
    )


@jax.jit
def erase(db: BowDB, slot) -> BowDB:
    return BowDB(
        word=db.word.at[slot].set(jnp.full_like(db.word[0], -1)),
        weight=db.weight.at[slot].set(jnp.zeros_like(db.weight[0])),
        valid=db.valid.at[slot].set(False),
    )


@functools.partial(jax.jit, static_argnames=('n_words',))
def dense_bow(word_u, weight_u, n_words: int):
    """Compacted row -> dense (W,) vector (query side only; W can be 10^6
    — one dense vector per query, never (K,W))."""
    return jnp.zeros((n_words,), jnp.float32).at[jnp.clip(word_u, 0)].add(
        jnp.where(word_u >= 0, weight_u, 0.0)
    )


@jax.jit
def scores(db: BowDB, q_dense):
    """(K,) DBoW2 L1 similarity s = Σ_w min(v_w, q_w) ∈ [0,1]
    (TemplatedVocabulary L1Scoring; reference score call
    src/KeyFrameDatabase.cc:180)."""
    q_at = q_dense[jnp.clip(db.word, 0)]  # (K,B)
    m = jnp.minimum(db.weight, q_at)
    m = jnp.where(db.word >= 0, m, 0.0)
    s = jnp.sum(m, axis=1)
    return jnp.where(db.valid, s, 0.0)


@jax.jit
def common_words(db: BowDB, q_dense):
    """(K,) int32 count of shared words with the query."""
    q_has = q_dense > 0
    hit = (db.word >= 0) & q_has[jnp.clip(db.word, 0)]
    return jnp.where(db.valid, jnp.sum(hit, axis=1), 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('top_covis',))
def detect_candidates(
    db: BowDB,
    q_dense,
    exclude_mask,
    covis_matrix,
    min_score=None,
    top_covis: int = 10,
):
    """Loop/relocalization candidate retrieval.

    Mirrors the reference's three-stage funnel
    (src/KeyFrameDatabase.cc:112-347):
      1. common-word counting, keep > 0.8 * maxCommonWords;
      2. absolute score floor (loop: minScore from the query's covisibility
         neighborhood; reloc: none);
      3. accumulate scores over each candidate's top-`top_covis`
         covisibility group, keep groups > 0.75 * bestAccScore, returning
         the best-scoring member of each qualifying group.

    Args:
      q_dense: (W,) query BoW. exclude_mask: (K,) bool — keyframes never
        eligible (the query's own covisibility group for loops, reference
        :139; zeros for reloc). covis_matrix: (K,K) int32 weights.
      min_score: optional scalar score floor.

    Returns:
      cand_mask: (K,) bool; score: (K,) f32 raw BoW scores.
    """
    s = scores(db, q_dense)
    cw = common_words(db, q_dense)
    eligible = db.valid & ~exclude_mask
    cw = jnp.where(eligible, cw, 0)
    max_common = jnp.max(cw)
    min_common = 0.8 * max_common.astype(jnp.float32)
    ok = eligible & (cw.astype(jnp.float32) > min_common) & (cw > 0)
    if min_score is not None:
        ok = ok & (s >= min_score)

    # Covisibility-group accumulation.
    K = s.shape[0]
    w_top, i_top = jax.lax.top_k(covis_matrix, min(top_covis, K))  # (K,top)
    grp_scores = jnp.where(w_top > 0, s[i_top] * jnp.where(ok[i_top], 1.0, 0.0), 0.0)
    own = jnp.where(ok, s, 0.0)
    acc = own + jnp.sum(grp_scores, axis=1)  # (K,)
    best_in_group = jnp.maximum(own, jnp.max(jnp.where(w_top > 0, s[i_top], 0.0), axis=1))
    best_acc = jnp.max(acc)
    group_ok = ok & (acc > 0.75 * best_acc)
    # Return the best member per qualifying group: the reference returns
    # pBestCandidate of each group; keeping every `ok` member whose own
    # score equals its group's best is the array-form equivalent.
    cand = group_ok & (own >= best_in_group * 0.999)
    return cand, s
