"""ORBvoc.txt loading: native scanner vs Python parser equivalence."""

import os
import subprocess

import numpy as np
import pytest

from orb_slam_cuda_tpu.ops import hamming
from orb_slam_cuda_tpu.vocab import load_orbvoc_text, vocabulary
from orb_slam_cuda_tpu.vocab import native_loader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_toy_vocab(path, rng, k=3, depth=2):
    """Complete k-ary tree in DBoW2 text format (BFS order, node lines
    `parent is_leaf d0..d31 weight`)."""
    lines = [f"{k} {depth} 0 0"]
    # BFS: depth-1 nodes (children of root id... DBoW2 ids: root is
    # implicit node 0; children listed with parent=0 etc.)
    n_per_level = [k**(d + 1) for d in range(depth)]
    node_id = 1
    parent_start = {0: [0]}
    parents_by_level = {0: [0]}
    ids_by_level = {}
    ids_by_level[0] = [0]
    for d in range(depth):
        ids = []
        for parent in ids_by_level[d]:
            for _ in range(k):
                ids.append(node_id)
                is_leaf = 1 if d == depth - 1 else 0
                desc = rng.integers(0, 256, 32)
                w = float(rng.uniform(0.1, 2.0)) if is_leaf else 0.0
                lines.append(
                    f"{parent} {is_leaf} "
                    + " ".join(str(int(x)) for x in desc)
                    + f" {w:.6f}"
                )
                node_id += 1
        ids_by_level[d + 1] = ids
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


class TestVocabIO:
    def test_python_parse_roundtrip(self, rng, tmp_path):
        p = str(tmp_path / "voc.txt")
        write_toy_vocab(p, rng)
        voc = load_orbvoc_text(p, levelsup=1)
        assert voc.k == 3
        assert voc.n_words == 9
        # All descriptors route to some leaf.
        d = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
        import jax.numpy as jnp

        word, node, w = voc.transform(hamming.bipolar(jnp.asarray(d)))
        assert (np.asarray(word) >= 0).all() and (np.asarray(word) < 9).all()

    def test_irregular_tree_early_leaves(self, rng, tmp_path):
        """Real DBoW2 trees are not complete: nodes may have fewer than k
        children and leaves occur above the bottom level
        (TemplatedVocabulary createWords). The descent must resolve such
        descriptors at their early leaf, with the leaf's own weight."""
        p = str(tmp_path / "voc_irregular.txt")
        k = 3
        # Tree: root(0) -> node1 (EARLY LEAF, weight 7.5), node2 (internal)
        #       node2 -> node3, node4 (leaves at depth 2; node2 has only
        #       2 of k=3 children)
        d1 = np.zeros(32, np.int64)          # descriptor all-zero bytes
        d2 = np.full(32, 255, np.int64)      # all-one bytes
        d3 = np.full(32, 255, np.int64); d3[0] = 0    # near d2
        d4 = np.full(32, 255, np.int64); d4[31] = 0   # near d2
        lines = [f"{k} 2 0 0"]
        for parent, leaf, desc, w in [
            (0, 1, d1, 7.5), (0, 0, d2, 0.0),
            (2, 1, d3, 1.25), (2, 1, d4, 2.0),
        ]:
            lines.append(
                f"{parent} {leaf} " + " ".join(str(x) for x in desc) + f" {w}"
            )
        open(p, "w").write("\n".join(lines) + "\n")
        voc = load_orbvoc_text(p, levelsup=1)
        assert voc.n_words == 3
        import jax.numpy as jnp

        q = np.stack([d1, d3, d4]).astype(np.uint8)
        bip = hamming.bipolar(
            jnp.asarray(np.frombuffer(q.tobytes(), np.uint32).reshape(3, 8))
        )
        word, node, w = voc.transform(bip)
        word, w = np.asarray(word), np.asarray(w)
        # d1 terminates at the depth-1 early leaf (word 0, weight 7.5);
        # d3/d4 descend through node2 to the depth-2 leaves.
        assert word[0] == 0 and abs(w[0] - 7.5) < 1e-6
        assert word[1] == 1 and abs(w[1] - 1.25) < 1e-6
        assert word[2] == 2 and abs(w[2] - 2.0) < 1e-6

    def test_native_matches_python(self, rng, tmp_path):
        if not native_loader.available():
            pytest.skip("native loader not built (run native/build.sh)")
        p = str(tmp_path / "voc.txt")
        write_toy_vocab(p, rng, k=4, depth=2)
        k, depth, parents, is_leaf, desc, weights = (
            native_loader.parse_orbvoc_text(p)
        )
        assert k == 4 and depth == 2
        assert len(parents) == 4 + 16
        assert is_leaf.sum() == 16
        # Cross-check line 1 against the text.
        line = open(p).read().splitlines()[1].split()
        assert parents[0] == int(line[0])
        np.testing.assert_array_equal(desc[0], [int(x) for x in line[2:34]])
        assert abs(weights[0] - float(line[34])) < 1e-9

        # Full assembly equality: native-backed load vs python fallback.
        voc_native = load_orbvoc_text(p, levelsup=1)
        import orb_slam_cuda_tpu.vocab.native_loader as nl

        saved = nl._lib
        try:
            nl._lib = None  # force python path
            voc_py = load_orbvoc_text(p, levelsup=1)
        finally:
            nl._lib = saved
        d = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
        import jax.numpy as jnp

        bip = hamming.bipolar(jnp.asarray(d))
        w1, n1, _ = voc_native.transform(bip)
        w2, n2, _ = voc_py.transform(bip)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
