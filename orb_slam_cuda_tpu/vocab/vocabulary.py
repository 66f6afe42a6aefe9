"""BoW vocabulary as arrays: batched Hamming tree descent on the MXU.

TPU-native replacement for DBoW2's `TemplatedVocabulary` (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:44-1202): the k-ary tree of
binary centroids becomes per-level arrays (children descriptors +
child-index tables + per-node word ids); `transform()` descends all N
descriptors of a frame in parallel, one small Hamming matmul per level,
instead of DBoW2's per-descriptor recursive walk.

Real DBoW2 trees are NOT complete k-ary trees: clusters smaller than k
produce nodes with fewer children, and a node can become a *leaf above
the bottom level* (TemplatedVocabulary.h createWords walks all nodes and
makes any childless node a word). The descent therefore carries an
`active` mask and per-level `node_word` tables so early-terminating
descriptors resolve their word where the tree ends, exactly like the
recursive propagate of the reference.

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
The assembly from the flat node list is fully vectorized so the stock
~1.1M-node vocabulary loads in seconds (tools/bench_vocab_scale.py
records the times).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming


@jax.tree_util.register_pytree_node_class
class Vocabulary:
    """Array-form k-ary vocabulary tree.

    Registered as a JAX pytree (array fields = children; k/depth/
    levelsup = static aux data) so it can be passed as a RUNTIME ARGUMENT
    to jitted functions. Closing over it instead would bake the stock
    vocabulary's ~0.5 GB of centroid arrays into the compiled program as
    constants — which overflows compile-payload limits (observed: remote
    TPU compile rejects the request) and bloats every executable.

    children_packed: (n_levels,) tuple of (n_nodes_l, k, 8) uint32
      BIT-PACKED centroid descriptors per level (hamming module word
      order: word w bit j = descriptor bit 32w+j; pads are zeros and
      masked by children_valid). Packed instead of bf16 bipolar because
      the per-level descent gathers (N,k) child blocks from HBM — 32
      bytes/child instead of 512 cut the stock 982k-word vocabulary from
      ~0.5 GB to 36 MB and the on-chip transform from 2.96 ms to the
      sub-millisecond class (PERF.md round 5); distances come from
      XOR+population_count on the VPU, which at (N,k)=2000x10 beats
      feeding gathered operands to the MXU.
    children_valid: tuple of (n_nodes_l, k) bool.
    child_base: tuple of (n_nodes_l,) int32 — index of each node's first
      child in the next level's node array (children are contiguous).
    node_word: tuple of (n_nodes_{l+1},) int32 — the DBoW2 word id of
      each level-(l+1) node if it is a leaf, else -1 (leaves may occur
      above the bottom level; see module docstring).
    word_weight: (n_words,) float32 idf weights.
    levelsup_depth: FROM-ROOT depth whose node id is reported for
      SearchByBoW gating. NOTE the convention: DBoW2's `levelsup`
      parameter counts levels up FROM THE LEAVES
      (TemplatedVocabulary.h:1226 `nid_level = m_L - levelsup`);
      load_orbvoc_text converts at that boundary, everything inside this
      class is from-root. Reference ORBVocabulary typedef
      include/ORBVocabulary.h:29-30 uses levelsup=4 from leaves.
    """

    def __init__(self, children_packed, children_valid, child_base,
                 node_word, word_weight, k, depth, levelsup_depth):
        self.children_packed = tuple(children_packed)
        self.children_valid = tuple(children_valid)
        self.child_base = tuple(child_base)
        self.node_word = tuple(node_word)
        self.word_weight = word_weight
        self.k = int(k)
        self.depth = int(depth)
        self.levelsup_depth = int(levelsup_depth)

    def tree_flatten(self):
        children = (self.children_packed, self.children_valid,
                    self.child_base, self.node_word, self.word_weight)
        return children, (self.k, self.depth, self.levelsup_depth)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.children_packed, obj.children_valid, obj.child_base,
         obj.node_word, obj.word_weight) = children
        obj.k, obj.depth, obj.levelsup_depth = aux
        return obj

    @property
    def n_words(self):
        return int(self.word_weight.shape[0])

    def transform(self, desc):
        """Batch tree descent.

        Args:
          desc: (N,8) packed uint32 descriptors, or (N,256) bipolar
            (legacy callers) — repacked internally; the descent runs on
            packed words (see children_packed docstring).

        Returns:
          word_id: (N,) int32 leaf word ids (0 with weight 0 for the
            degenerate no-word case, which real DBoW2 trees never hit).
          node_id: (N,) int32 node ids at `levelsup_depth`.
          weight: (N,) float32 idf weight of each word.
        """
        if desc.shape[-1] == hamming.N_BITS:
            q = hamming.pack_bits(desc > 0)
        else:
            q = desc.astype(jnp.uint32)
        n = q.shape[0]
        node = jnp.zeros((n,), jnp.int32)  # all start at root (level 0 node 0)
        node_at_levelsup = jnp.zeros((n,), jnp.int32)
        word = jnp.full((n,), -1, jnp.int32)
        active = jnp.ones((n,), bool)
        # Level-unique node id of the current position: level-local ids
        # alias across levels, so early-leaf encodings below fold in a
        # per-level base (root = 0, then each level's child space).
        glob = jnp.zeros((n,), jnp.int32)
        glob_off = 1
        for level in range(self.depth):
            cpack = self.children_packed[level]  # (M,k,8) uint32
            cvalid = self.children_valid[level]  # (M,k)
            base = self.child_base[level]  # (M,)
            nword = self.node_word[level]  # (M_next,)
            my_cpack = cpack[node]  # (N,k,8) — 32 B/child HBM gather
            my_valid = cvalid[node]
            x = jnp.bitwise_xor(my_cpack, q[:, None, :])
            dist = jnp.sum(
                jax.lax.population_count(x).astype(jnp.int32), axis=-1
            )  # (N,k)
            dist = jnp.where(my_valid, dist, jnp.int32(1 << 30))
            best = jnp.argmin(dist, axis=-1).astype(jnp.int32)
            step = active & my_valid.any(-1)
            nxt = base[node] + best
            node = jnp.where(step, nxt, node)
            glob = jnp.where(step, glob_off + nxt, glob)
            glob_off += int(nword.shape[0])
            w_here = nword[jnp.clip(nxt, 0, nword.shape[0] - 1)]
            word = jnp.where(step & (w_here >= 0), w_here, word)
            active = step & (w_here < 0)
            if level + 1 == self.levelsup_depth:
                # Descriptors whose path already ended (early leaf) carry
                # their terminal node in a disjoint negative id space so
                # the SearchByBoW bucket gate (node equality) can't alias
                # them onto an unrelated level-`levelsup` node. The
                # encoding uses the LEVEL-UNIQUE id (per-level base +
                # local id): terminal nodes at different levels with the
                # same local index must not share a bucket.
                node_at_levelsup = jnp.where(active, node, -2 - glob)
        resolved = word >= 0
        word_id = jnp.where(resolved, word, 0)
        weight = jnp.where(resolved, self.word_weight[word_id], 0.0)
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


def _np_pack_bits(bits01):
    """(N,256) {0,1} uint8 -> (N,8) uint32, hamming word order."""
    by = np.packbits(bits01.astype(np.uint8), axis=-1, bitorder="little")
    return np.ascontiguousarray(by).view("<u4").reshape(bits01.shape[0], 8)


def build_vocabulary(descriptors, k: int = 8, depth: int = 3,
                     levelsup_depth: int = 1,
                     seed: int = 0, weights=None) -> Vocabulary:
    """Train a k^depth-word vocabulary from packed (N,8) uint32 descriptors.

    Small-scale counterpart of DBoW2's offline training (create(),
    TemplatedVocabulary.h), sufficient for synthetic-scene loop closure;
    load_orbvoc_text() is the path for the stock 10^6-word vocabulary.

    `levelsup_depth` is FROM-ROOT depth (the Vocabulary convention);
    DBoW2's from-the-leaves `levelsup` is converted only at the
    load_orbvoc_text boundary.
    """
    rng = np.random.default_rng(seed)
    bits = np.asarray(hamming.unpack_bits(jnp.asarray(descriptors)))
    # Recursive top-down clustering, building contiguous per-level arrays.
    levels_desc, levels_valid, levels_base, levels_word = [], [], [], []
    current = [bits]  # clusters of descriptors for nodes at this level
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
            pad_desc = np.zeros((k, 8), np.uint32)
            if kk:
                pad_desc[:kk] = _np_pack_bits(centers.astype(np.uint8))
            valid = np.zeros(k, bool)
            valid[:kk] = True
            cdescs.append(pad_desc)
            cvalids.append(valid)
            bases.append(child_counter)
            child_counter += kk
            for c in range(kk):
                next_clusters.append(cluster[assign == c] if len(cluster) else cluster)
        levels_desc.append(jnp.asarray(np.asarray(cdescs), jnp.uint32))
        levels_valid.append(jnp.asarray(np.asarray(cvalids)))
        levels_base.append(jnp.asarray(np.asarray(bases), jnp.int32))
        # Trainer trees carry words only at the bottom level (every
        # cluster keeps subdividing until `depth`).
        n_next = child_counter
        if level == depth - 1:
            levels_word.append(jnp.arange(n_next, dtype=jnp.int32))
        else:
            levels_word.append(jnp.full((max(n_next, 1),), -1, jnp.int32))
        current = next_clusters
    n_words = len(current)
    if weights is None:
        # idf from training distribution: log(N/n_i), floor at small eps.
        counts = np.array([max(len(c), 1) for c in current], np.float64)
        w = np.log(max(len(bits), 1) / counts)
        w = np.maximum(w, 1e-3)
    else:
        w = np.asarray(weights, np.float64)
    assert len(w) == n_words
    return Vocabulary(
        children_packed=tuple(levels_desc),
        children_valid=tuple(levels_valid),
        child_base=tuple(levels_base),
        node_word=tuple(levels_word),
        word_weight=jnp.asarray(w, jnp.float32),
        k=k,
        depth=depth,
        levelsup_depth=levelsup_depth,
    )


def load_orbvoc_text(path: str, levelsup: int = 4) -> Vocabulary:
    """Load the stock ORBvoc.txt (DBoW2 text format: header `k L s1 s2`,
    then one line per node: `parent is_leaf d0..d31 weight`, nodes in
    BFS order). Reference load: TemplatedVocabulary.h:241 loadFromTextFile.

    `levelsup` follows DBoW2 semantics: levels up FROM THE LEAVES — the
    direct-index node lives at tree level `L - levelsup` from the root
    (TemplatedVocabulary.h:1226 `nid_level = m_L - levelsup`; ORB-SLAM
    passes 4, src/Frame.cc:399). For the stock k=10 L=6 vocabulary that
    is level 2 = 100 gating nodes; interpreting 4 as a from-root depth
    (10k nodes) made SearchByBoW 100x more selective than the reference
    and collapsed tracking fallbacks on the stock vocabulary.

    Uses the native C++ scanner (native/vocab_loader.cpp via
    vocab/native_loader.py) when built — the text parse of the stock
    vocabulary dominates the reference's startup (SURVEY.md §3.1) — and
    falls back to a NumPy text parse otherwise.
    """
    from . import native_loader

    if native_loader.available():
        k, depth, parents, is_leaf, desc_bytes, weights = (
            native_loader.parse_orbvoc_text(path)
        )
        return _assemble_from_flat(
            np.asarray(parents), np.asarray(is_leaf).astype(bool),
            np.asarray(desc_bytes, np.uint8), np.asarray(weights),
            int(k), int(depth), max(1, int(depth) - levelsup),
        )

    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        body = np.loadtxt(f, dtype=np.float64, ndmin=2)
    if body.size == 0:
        raise ValueError(f"empty vocabulary file: {path}")
    parents = body[:, 0].astype(np.int64)
    is_leaf = body[:, 1] != 0
    desc_bytes = body[:, 2:34].astype(np.uint8)
    weights = body[:, 34]
    return _assemble_from_flat(parents, is_leaf, desc_bytes, weights,
                               k, depth, max(1, int(depth) - levelsup))


def _assemble_from_flat(parents, is_leaf, desc_bytes, weights, k, depth,
                        levelsup):
    """Build the per-level arrays from a flat node list (node i's parent
    always precedes it). Fully vectorized — the stock vocabulary has
    ~1.1M nodes and per-node Python loops took tens of seconds.

    The flat list EXCLUDES the root: row i describes node i+1 of the
    DBoW2 id space, with `parents` in that same id space (0 = root), the
    layout loadFromTextFile writes."""
    n_rows = len(parents)
    # Depth of each node (1-based rows; root depth 0). Parent ids precede
    # children, so propagating depth converges in `depth` rounds.
    node_depth = np.ones(n_rows, np.int64)
    for _ in range(max(depth, 1)):
        parent_depth = np.where(parents > 0, node_depth[parents - 1], 0)
        nd = parent_depth + 1
        if (nd == node_depth).all():
            break
        node_depth = nd
    max_depth = int(node_depth.max())

    # Word ids in DBoW2 order: leaves numbered by flat-file order
    # (TemplatedVocabulary createWords walks nodes in id order).
    word_of = np.full(n_rows, -1, np.int64)
    leaf_rows = np.flatnonzero(is_leaf)
    word_of[leaf_rows] = np.arange(len(leaf_rows))

    # Bytes -> packed uint32 words in the hamming module's order (bit b =
    # byte b//8 bit b%8 little-endian = word b//32 shift b%32).
    packed = np.ascontiguousarray(desc_bytes).view("<u4").reshape(-1, 8)

    # Per-level contiguous renumbering, grouped by parent so each
    # parent's children are contiguous (base + position addressing).
    local_id = np.full(n_rows + 1, -1, np.int64)  # by DBoW2 id (0=root)
    local_id[0] = 0
    levels_desc, levels_valid, levels_base, levels_word = [], [], [], []
    for d in range(max_depth):
        parent_rows_local = local_id  # ids assigned in previous round
        child_rows = np.flatnonzero(node_depth == d + 1)
        m = 1 if d == 0 else len(np.flatnonzero(node_depth == d))
        pl = parent_rows_local[parents[child_rows]]
        order = np.argsort(pl, kind="stable")
        ch = child_rows[order]
        pl_s = pl[order]
        counts = np.bincount(pl_s, minlength=m)
        total = len(ch)
        starts = np.cumsum(counts) - counts
        slot = np.arange(total) - np.repeat(starts, counts)
        if (slot >= k).any():
            raise ValueError("node with more than k children")
        cdesc = np.zeros((m, k, 8), np.uint32)
        cvalid = np.zeros((m, k), bool)
        cdesc[pl_s, slot] = packed[ch]
        cvalid[pl_s, slot] = True
        levels_desc.append(jnp.asarray(cdesc, jnp.uint32))
        levels_valid.append(jnp.asarray(cvalid))
        levels_base.append(jnp.asarray(starts, jnp.int32))
        levels_word.append(jnp.asarray(word_of[ch], jnp.int32))
        # Assign this level's local ids for the next round.
        local_id = np.full(n_rows + 1, -1, np.int64)
        local_id[ch + 1] = np.arange(total)
    leaf_weights = weights[leaf_rows]
    return Vocabulary(
        children_packed=tuple(levels_desc),
        children_valid=tuple(levels_valid),
        child_base=tuple(levels_base),
        node_word=tuple(levels_word),
        word_weight=jnp.asarray(leaf_weights, jnp.float32),
        k=k,
        depth=max_depth,
        levelsup_depth=min(levelsup, max_depth - 1),
    )
