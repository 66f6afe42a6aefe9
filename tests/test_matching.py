"""Tests for Hamming ops, vocabulary, and the search strategies."""

import jax.numpy as jnp
import numpy as np

from orb_slam_cuda_tpu.matching import core, search
from orb_slam_cuda_tpu.ops import hamming
from orb_slam_cuda_tpu.vocab import build_vocabulary


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def np_hamming(a, b):
    ab = np.unpackbits(a.view(np.uint8), axis=1)
    bb = np.unpackbits(b.view(np.uint8), axis=1)
    return (ab[:, None, :] != bb[None, :, :]).sum(-1)


class TestHamming:
    def test_matrix_matches_numpy(self, rng):
        a, b = rand_desc(rng, 33), rand_desc(rng, 47)
        ref = np_hamming(a, b)
        via_mm = np.asarray(hamming.hamming_matrix(hamming.bipolar(jnp.asarray(a)),
                                                   hamming.bipolar(jnp.asarray(b))))
        via_pop = np.asarray(hamming.hamming_matrix_packed(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(via_mm, ref)
        np.testing.assert_array_equal(via_pop, ref)

    def test_identical_zero(self, rng):
        a = rand_desc(rng, 10)
        d = np.asarray(hamming.hamming_pairwise(jnp.asarray(a), jnp.asarray(a)))
        assert (d == 0).all()

    def test_unpack_order(self):
        d = np.zeros((1, 8), np.uint32)
        d[0, 0] = 0b101  # bits 0 and 2 of word 0
        bits = np.asarray(hamming.unpack_bits(jnp.asarray(d)))[0]
        assert bits[0] == 1 and bits[1] == 0 and bits[2] == 1
        d2 = np.zeros((1, 8), np.uint32)
        d2[0, 7] = 1 << 31  # last bit
        assert np.asarray(hamming.unpack_bits(jnp.asarray(d2)))[0, 255] == 1


class TestVocabulary:
    def test_transform_assigns_nearest_leaf(self, rng):
        train = rand_desc(rng, 400)
        voc = build_vocabulary(train, k=4, depth=2, levelsup_depth=1)
        test = rand_desc(rng, 32)
        bip = hamming.bipolar(jnp.asarray(test))
        word, node, weight = voc.transform(bip)
        word, node = np.asarray(word), np.asarray(node)
        assert (word >= 0).all() and (word < voc.n_words).all()
        assert (node >= 0).all()
        assert np.asarray(weight).shape == (32,)

    def test_same_descriptor_same_word(self, rng):
        train = rand_desc(rng, 300)
        voc = build_vocabulary(train, k=5, depth=2)
        d = rand_desc(rng, 1).repeat(8, axis=0)
        word, _, _ = voc.transform(hamming.bipolar(jnp.asarray(d)))
        assert len(np.unique(np.asarray(word))) == 1

    def test_close_descriptors_usually_share_words(self, rng):
        train = rand_desc(rng, 500)
        voc = build_vocabulary(train, k=4, depth=2)
        base = rand_desc(rng, 64)
        # Flip 4 random bits.
        perturbed = base.copy()
        for i in range(64):
            for _ in range(4):
                w, b = rng.integers(8), rng.integers(32)
                perturbed[i, w] ^= np.uint32(1) << np.uint32(b)
        w1, _, _ = voc.transform(hamming.bipolar(jnp.asarray(base)))
        w2, _, _ = voc.transform(hamming.bipolar(jnp.asarray(perturbed)))
        agree = (np.asarray(w1) == np.asarray(w2)).mean()
        assert agree > 0.5


class TestCore:
    def test_best_two(self):
        dist = jnp.asarray(np.array([[5.0, 2.0, 9.0], [1.0, 1.0, 3.0]]))
        gate = jnp.ones((2, 3), bool)
        bi, b, s, si = core.best_two(dist, gate)
        assert list(np.asarray(bi)) == [1, 0]
        assert list(np.asarray(b)) == [2.0, 1.0]
        assert list(np.asarray(s)) == [5.0, 1.0]

    def test_best_two_gating(self):
        dist = jnp.asarray(np.array([[5.0, 2.0, 9.0]]))
        gate = jnp.asarray(np.array([[True, False, False]]))
        bi, b, s, _ = core.best_two(dist, gate)
        assert int(bi[0]) == 0 and float(b[0]) == 5.0 and float(s[0]) >= core.INF

    def test_rotation_consistency(self, rng):
        # 80 matches at ~10 deg, 5 outliers spread out.
        rot = np.concatenate([rng.normal(10, 1.5, 80), np.array([100.0, 200, 250, 300, 170.0])])
        valid = np.ones(85, bool)
        keep = np.asarray(core.rotation_consistency(jnp.asarray(rot, jnp.float32), jnp.asarray(valid)))
        assert keep[:80].mean() > 0.95
        assert keep[80:].sum() == 0

    def test_resolve_duplicates(self):
        tgt = jnp.asarray(np.array([3, 3, 1, 3], np.int32))
        dist = jnp.asarray(np.array([4.0, 2.0, 1.0, 2.0]))
        valid = jnp.ones(4, bool)
        keep = np.asarray(core.resolve_duplicate_targets(tgt, dist, valid, 5))
        # Target 3 claimed by queries 0,1,3 -> query 1 wins (dist 2, lower q).
        assert list(keep) == [False, True, True, False]


def make_feats(rng, n, spread=200.0):
    uv = rng.uniform(10, spread, size=(n, 2)).astype(np.float32)
    desc = rand_desc(rng, n)
    return {
        "uv": jnp.asarray(uv),
        "desc": jnp.asarray(desc),
        "bip": hamming.bipolar(jnp.asarray(desc)),
        "oct": jnp.zeros((n,), jnp.int32),
        "ang": jnp.asarray(rng.uniform(0, 360, n).astype(np.float32)),
        "valid": jnp.ones((n,), bool),
    }


class TestSearch:
    def test_projection_recovers_known_assoc(self, rng):
        f = make_feats(rng, 128)
        # Queries = subset of targets with slightly shifted projections.
        sel = np.arange(0, 128, 2)
        q_uv = np.asarray(f["uv"])[sel] + rng.normal(0, 1.0, (64, 2))
        res = search.by_projection(
            jnp.asarray(q_uv.astype(np.float32)), f["bip"][sel], jnp.ones(64, bool),
            jnp.zeros(64, jnp.int32),
            f["uv"], f["oct"], f["ang"], f["bip"], f["valid"],
            scale_factors=(1.0,), radius=6.0, max_dist=30,
        )
        idx = np.asarray(res.idx)
        assert (idx == sel).mean() > 0.95

    def test_projection_window_gate(self, rng):
        f = make_feats(rng, 64)
        # Query descriptor matches target 0 but is projected far away.
        q_uv = jnp.asarray(np.asarray(f["uv"])[0:1] + 500.0)
        res = search.by_projection(
            q_uv, f["bip"][0:1], jnp.ones(1, bool), jnp.zeros(1, jnp.int32),
            f["uv"], f["oct"], f["ang"], f["bip"], f["valid"],
            scale_factors=(1.0,), radius=6.0,
        )
        assert int(res.idx[0]) == -1

    def test_initialization_matching(self, rng):
        n = 150
        f1 = make_feats(rng, n)
        shift = np.array([8.0, -5.0], np.float32)
        f2 = {**f1}
        f2["uv"] = f1["uv"] + jnp.asarray(shift)
        # Perturb descriptors slightly (flip 2 bits).
        d2 = np.asarray(f1["desc"]).copy()
        for i in range(n):
            w, b = rng.integers(8), rng.integers(32)
            d2[i, w] ^= np.uint32(1) << np.uint32(b)
        f2["desc"] = jnp.asarray(d2)
        f2["bip"] = hamming.bipolar(f2["desc"])
        res = search.for_initialization(
            f1["uv"], f1["bip"], f1["valid"], f1["ang"],
            f2["uv"], f2["bip"], f2["valid"], f2["ang"], f2["oct"],
            f1["oct"], window=100.0,
        )
        idx = np.asarray(res.idx)
        assert (idx == np.arange(n)).mean() > 0.9

    def test_bow_gating(self, rng):
        n = 64
        f1 = make_feats(rng, n)
        nodes1 = jnp.asarray((rng.integers(0, 8, n)).astype(np.int32))
        res = search.by_bow(
            nodes1, f1["bip"], f1["valid"], f1["ang"],
            nodes1, f1["bip"], f1["valid"], f1["ang"],
            ratio=1.0, check_rotation=False,
        )
        # Identical features sharing nodes must match themselves.
        assert (np.asarray(res.idx) == np.arange(n)).all()
        # Different nodes -> no matches.
        res2 = search.by_bow(
            nodes1, f1["bip"], f1["valid"], f1["ang"],
            nodes1 + 100, f1["bip"], f1["valid"], f1["ang"],
            ratio=1.0, check_rotation=False,
        )
        assert (np.asarray(res2.idx) == -1).all()

    def test_predict_octave(self):
        lvl = search.predict_octave(
            jnp.asarray([10.0, 5.0, 1.0]), jnp.asarray([10.0, 10.0, 10.0]),
            float(np.log(1.2)), 8,
        )
        assert list(np.asarray(lvl)) == [0, 4, 7]
