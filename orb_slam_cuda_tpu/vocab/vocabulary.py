"""BoW vocabulary as arrays: batched Hamming tree descent on the MXU.

TPU-native replacement for DBoW2's `TemplatedVocabulary` (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:44-1202): the k-ary tree of
binary centroids becomes three arrays (per-level children descriptors +
child-index tables + leaf word ids); `transform()` descends all N
descriptors of a frame in parallel, one small Hamming matmul per level,
instead of DBoW2's per-descriptor recursive walk.

Outputs per descriptor:
  * word id (leaf index)         — for BoW vectors / inverted-file scoring
  * node id at depth `levelsup`  — the DBoW2 "direct index" used to gate
    SearchByBoW (reference: src/ORBmatcher.cc:159-289 iterates
    FeatureVector buckets; here the gate is `node_i == node_j`)
  * word weight (idf)            — for tf-idf BoW vectors

Includes a trainer (binary k-means with bit-majority centroids, the same
algorithm DBoW2 uses offline) so CI can build small vocabularies from
synthetic images, and a loader for the stock ORBvoc.txt text format
(reference: TemplatedVocabulary.h:241 loadFromTextFile) for real runs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import hamming


class Vocabulary(NamedTuple):
    """Array-form k-ary vocabulary tree.

    children_desc: (n_levels,) list-like tuple of (n_nodes_l, k, 256) bf16
      bipolar centroid descriptors per level (padded with +1s).
    children_valid: tuple of (n_nodes_l, k) bool.
    child_base: tuple of (n_nodes_l,) int32 — index of each node's first
      child in the next level's node array (children are contiguous).
    word_weight: (n_words,) float32 idf weights.
    levelsup_depth: depth whose node id is reported for SearchByBoW gating
      (DBoW2 levelsup=4 from root, reference ORBVocabulary typedef
      include/ORBVocabulary.h:29-30).
    """

    children_desc: tuple
    children_valid: tuple
    child_base: tuple
    word_weight: jnp.ndarray
    k: int
    depth: int
    levelsup_depth: int

    @property
    def n_words(self):
        return int(self.word_weight.shape[0])

    def transform(self, desc_bipolar):
        """Batch tree descent.

        Args:
          desc_bipolar: (N,256) bipolar (bf16) descriptors.

        Returns:
          word_id: (N,) int32 leaf word ids.
          node_id: (N,) int32 node ids at `levelsup_depth`.
          weight: (N,) float32 idf weight of each word.
        """
        n = desc_bipolar.shape[0]
        node = jnp.zeros((n,), jnp.int32)  # all start at root (level 0 node 0)
        node_at_levelsup = jnp.zeros((n,), jnp.int32)
        for level in range(self.depth):
            cdesc = self.children_desc[level]  # (M,k,256)
            cvalid = self.children_valid[level]  # (M,k)
            base = self.child_base[level]  # (M,)
            my_cdesc = cdesc[node]  # (N,k,256)
            my_valid = cvalid[node]
            # (N,k) dot products -> Hamming; batched small matmul.
            dot = jnp.einsum(
                "nkb,nb->nk",
                my_cdesc.astype(jnp.float32),
                desc_bipolar.astype(jnp.float32),
            )
            dist = (hamming.N_BITS - dot) * 0.5
            dist = jnp.where(my_valid, dist, jnp.inf)
            best = jnp.argmin(dist, axis=-1).astype(jnp.int32)
            node = base[node] + best
            if level + 1 == self.levelsup_depth:
                node_at_levelsup = node
        word_id = node
        weight = self.word_weight[word_id]
        return word_id, node_at_levelsup, weight


def _bit_majority(descs_bits):
    """Binary centroid: per-bit majority vote (DBoW2's meanValue for FORB,
    Thirdparty/DBoW2/DBoW2/FORB.cpp mean via bit counting)."""
    return (descs_bits.mean(axis=0) >= 0.5).astype(np.uint8)


def _kmeans_binary(bits, k, rng, iters=8):
    """k-means on {0,1}^256 with Hamming metric and majority centroids."""
    n = bits.shape[0]
    if n <= k:
        return bits.copy(), np.arange(n) % max(n, 1)
    # k-means++ style init on Hamming distances.
    centers = [bits[rng.integers(n)]]
    d2 = None
    for _ in range(k - 1):
        d = np.abs(bits[:, None, :] - np.asarray(centers)[None, :, :]).sum(-1).min(1)
        p = d.astype(np.float64) ** 2
        p = p / p.sum() if p.sum() > 0 else np.full(n, 1.0 / n)
        centers.append(bits[rng.choice(n, p=p)])
    centers = np.asarray(centers)
    assign = np.zeros(n, np.int64)
    for _ in range(iters):
        d = np.abs(bits[:, None, :].astype(np.int16) - centers[None, :, :].astype(np.int16)).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            sel = bits[assign == c]
            if len(sel):
                centers[c] = _bit_majority(sel)
    return centers, assign


def build_vocabulary(descriptors, k: int = 8, depth: int = 3, levelsup: int = 1,
                     seed: int = 0, weights=None) -> Vocabulary:
    """Train a k^depth-word vocabulary from packed (N,8) uint32 descriptors.

    Small-scale counterpart of DBoW2's offline training (create(),
    TemplatedVocabulary.h), sufficient for synthetic-scene loop closure;
    load_orbvoc_text() is the path for the stock 10^6-word vocabulary.
    """
    rng = np.random.default_rng(seed)
    bits = np.asarray(hamming.unpack_bits(jnp.asarray(descriptors)))
    # Recursive top-down clustering, building contiguous per-level arrays.
    levels_desc, levels_valid, levels_base = [], [], []
    current = [bits]  # clusters of descriptors for nodes at this level
    word_count = 0
    for level in range(depth):
        cdescs, cvalids, bases = [], [], []
        next_clusters = []
        child_counter = 0
        for cluster in current:
            if len(cluster) == 0:
                centers = np.zeros((0, hamming.N_BITS), np.uint8)
                assign = np.zeros(0, np.int64)
            else:
                centers, assign = _kmeans_binary(cluster, k, rng)
            kk = len(centers)
            pad_desc = np.ones((k, hamming.N_BITS), np.int8)
            pad_desc[:kk] = centers.astype(np.int8) * 2 - 1
            valid = np.zeros(k, bool)
            valid[:kk] = True
            cdescs.append(pad_desc)
            cvalids.append(valid)
            bases.append(child_counter)
            child_counter += kk
            for c in range(kk):
                next_clusters.append(cluster[assign == c] if len(cluster) else cluster)
        levels_desc.append(jnp.asarray(np.asarray(cdescs), jnp.bfloat16))
        levels_valid.append(jnp.asarray(np.asarray(cvalids)))
        levels_base.append(jnp.asarray(np.asarray(bases), jnp.int32))
        current = next_clusters
    n_words = sum(1 for _ in current)
    if weights is None:
        # idf from training distribution: log(N/n_i), floor at small eps.
        counts = np.array([max(len(c), 1) for c in current], np.float64)
        w = np.log(max(len(bits), 1) / counts)
        w = np.maximum(w, 1e-3)
    else:
        w = np.asarray(weights, np.float64)
    return Vocabulary(
        children_desc=tuple(levels_desc),
        children_valid=tuple(levels_valid),
        child_base=tuple(levels_base),
        word_weight=jnp.asarray(w, jnp.float32),
        k=k,
        depth=depth,
        levelsup_depth=levelsup,
    )


def load_orbvoc_text(path: str, levelsup: int = 4) -> Vocabulary:
    """Load the stock ORBvoc.txt (DBoW2 text format: header `k L s1 s2`,
    then one line per node: `parent_offset is_leaf d0..d31 weight`, nodes in
    BFS order). Reference load: TemplatedVocabulary.h:241 loadFromTextFile.

    Uses the native C++ scanner (native/vocab_loader.cpp via
    vocab/native_loader.py) when built — the text parse of the stock
    vocabulary dominates the reference's startup (SURVEY.md §3.1) — and
    falls back to the pure-Python loop otherwise.
    """
    from . import native_loader

    if native_loader.available():
        k, depth, parents, is_leaf, desc_bytes, weights = (
            native_loader.parse_orbvoc_text(path)
        )
        return _assemble_from_flat(
            parents, is_leaf, desc_bytes.astype(np.uint8), weights,
            int(k), int(depth), levelsup,
        )

    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        parents, is_leaf, descs, weights = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            is_leaf.append(bool(int(parts[1])))
            descs.append([int(x) for x in parts[2:34]])
            weights.append(float(parts[34]))
    return _assemble_from_flat(
        np.asarray(parents), np.asarray(is_leaf), np.asarray(descs, np.uint8),
        np.asarray(weights), k, depth, levelsup,
    )


def _assemble_from_flat(parents, is_leaf, desc_bytes, weights, k, depth, levelsup):
    """Build the per-level arrays from a flat BFS node list."""
    n_nodes = len(parents)
    # Depth of each node by following parent chain (BFS order: parents first).
    node_depth = np.zeros(n_nodes, np.int32)
    for i in range(1, n_nodes):
        node_depth[i] = node_depth[parents[i]] + 1
    # Convert byte descriptors to bit arrays.
    bits = np.unpackbits(desc_bytes, axis=1, bitorder="little")
    max_depth = int(node_depth.max())
    # Per-level contiguous renumbering.
    level_nodes = [np.where(node_depth == d)[0] for d in range(max_depth + 1)]
    local_id = np.zeros(n_nodes, np.int64)
    for nodes in level_nodes:
        local_id[nodes] = np.arange(len(nodes))
    levels_desc, levels_valid, levels_base = [], [], []
    word_of_node = np.full(n_nodes, -1, np.int64)
    leaf_nodes = np.where(is_leaf)[0]
    word_of_node[leaf_nodes] = np.arange(len(leaf_nodes))
    for d in range(max_depth):
        parent_ids = level_nodes[d]
        m = len(parent_ids)
        cdesc = np.ones((m, k, hamming.N_BITS), np.int8)
        cvalid = np.zeros((m, k), bool)
        base = np.zeros(m, np.int64)
        # children of each parent, in BFS order (contiguous by construction).
        children_of = {p: [] for p in parent_ids}
        for i in np.where(node_depth == d + 1)[0]:
            children_of[parents[i]].append(i)
        counter = 0
        for j, p in enumerate(parent_ids):
            ch = children_of[p]
            base[j] = counter
            for c_idx, c in enumerate(ch[:k]):
                cdesc[j, c_idx] = bits[c].astype(np.int8) * 2 - 1
                cvalid[j, c_idx] = True
            counter += len(ch[:k])
        levels_desc.append(jnp.asarray(cdesc, jnp.bfloat16))
        levels_valid.append(jnp.asarray(cvalid))
        levels_base.append(jnp.asarray(base, jnp.int32))
    leaf_weights = weights[leaf_nodes]
    return Vocabulary(
        children_desc=tuple(levels_desc),
        children_valid=tuple(levels_valid),
        child_base=tuple(levels_base),
        word_weight=jnp.asarray(leaf_weights, jnp.float32),
        k=k,
        depth=max_depth,
        levelsup_depth=min(levelsup, max_depth - 1),
    )
