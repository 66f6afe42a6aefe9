"""Scale-true vocabulary benchmark: load a stock-sized ORBvoc.txt.

The reference's startup is dominated by parsing the ~1.1M-node ORBvoc
text file (reference TemplatedVocabulary.h:241 loadFromTextFile, called
at src/System.cc:64-65 — takes tens of seconds on the TX2). This tool
generates a full-size k=10 L=6 vocabulary in the exact DBoW2 text format
(~1.11M nodes, ~140 MB; cached in /tmp), then measures:

  * native C++ mmap scan (native/vocab_loader.cpp)
  * NumPy text parse fallback
  * array assembly (flat node list -> per-level descent tables)
  * device transfer + one jitted 2000-descriptor transform

Usage: JAX_PLATFORMS=cpu python tools/bench_vocab_scale.py
       (add DBOW_SMALL=1 for a k=10 L=4 smoke run)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SMALL = bool(int(os.environ.get("DBOW_SMALL", "0")))
K = 10
DEPTH = 4 if SMALL else 6
PATH = f"/tmp/orbvoc_k{K}_L{DEPTH}.txt"


def generate(path):
    """Complete-ish k-ary tree, BFS ids, DBoW2 text lines. A small
    fraction of depth-(L-1) nodes are made EARLY LEAVES (their subtree
    dropped) so the irregular-tree path is exercised at scale, like the
    stock vocabulary (which has ~1.08M of the 1.11M complete-tree
    nodes)."""
    rng = np.random.default_rng(3)
    t0 = time.perf_counter()
    level_sizes = [K ** (d + 1) for d in range(DEPTH)]
    # Drop ~2% of the bottom-level subtrees: mark their parents as leaves.
    early = rng.random(level_sizes[DEPTH - 2]) < 0.02 if DEPTH >= 2 else None
    with open(path, "w") as f:
        f.write(f"{K} {DEPTH} 0 0\n")
        level_start = [1]
        for d in range(DEPTH - 1):
            level_start.append(level_start[-1] + level_sizes[d])
        kept_parent_id = None
        for d in range(DEPTH):
            n = level_sizes[d]
            if d == 0:
                parent_ids = np.zeros(n, np.int64)
                keep = np.ones(n, bool)
            else:
                parent_ids = np.repeat(parent_keep_ids, K)
                keep = np.ones(len(parent_ids), bool)
            if d == DEPTH - 2 and early is not None:
                is_leaf_lvl = np.zeros(len(parent_ids), np.int64)
                is_leaf_lvl[early[: len(parent_ids)]] = 1
            else:
                is_leaf_lvl = np.full(
                    len(parent_ids), 1 if d == DEPTH - 1 else 0, np.int64
                )
            m = len(parent_ids)
            desc = rng.integers(0, 256, (m, 32))
            w = np.where(
                is_leaf_lvl > 0, rng.uniform(0.05, 4.0, m), 0.0
            )
            rows = np.column_stack([parent_ids, is_leaf_lvl, desc])
            # Fast formatted dump: ints then weight.
            buf = []
            for i in range(m):
                buf.append(
                    " ".join(map(str, rows[i])) + f" {w[i]:.6f}"
                )
                if len(buf) == 65536:
                    f.write("\n".join(buf) + "\n")
                    buf = []
            if buf:
                f.write("\n".join(buf) + "\n")
            # ids of this level's nodes that remain INTERNAL
            ids = np.arange(m, dtype=np.int64) + (
                1 if d == 0 else next_id_start
            )
            if d == 0:
                next_id_start = 1 + m
            else:
                next_id_start = next_id_start + m
            parent_keep_ids = ids[is_leaf_lvl == 0]
            if d == DEPTH - 1:
                break
    return time.perf_counter() - t0


def main():
    import jax

    # sitecustomize imports jax before env vars apply; force via config.
    jax.config.update("jax_platforms", "cpu")

    from orb_slam_cuda_tpu.vocab import load_orbvoc_text, native_loader
    from orb_slam_cuda_tpu.ops import hamming
    import jax.numpy as jnp

    out = {"metric": "vocab_scale", "k": K, "depth": DEPTH}
    if not os.path.exists(PATH):
        print("generating...", file=sys.stderr)
        out["generate_s"] = round(generate(PATH), 2)
    out["file_mb"] = round(os.path.getsize(PATH) / 1e6, 1)

    t0 = time.perf_counter()
    voc = load_orbvoc_text(PATH)
    out["load_native_s" if native_loader.available() else "load_python_s"] = (
        round(time.perf_counter() - t0, 2)
    )
    out["n_words"] = voc.n_words
    out["n_levels"] = voc.depth

    if native_loader.available():
        import orb_slam_cuda_tpu.vocab.native_loader as nl

        saved = nl._lib
        try:
            nl._lib = None
            t0 = time.perf_counter()
            voc_py = load_orbvoc_text(PATH)
            out["load_python_s"] = round(time.perf_counter() - t0, 2)
        finally:
            nl._lib = saved
        assert voc_py.n_words == voc.n_words

    # Transform throughput: 2000 descriptors (a KITTI frame's worth).
    rng = np.random.default_rng(0)
    d = rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)
    bip = hamming.bipolar(jnp.asarray(d))
    # Vocab as runtime argument (pytree), NOT a closure constant — the
    # full-size tree is ~0.5 GB of arrays.
    fn = jax.jit(lambda v, x: v.transform(x))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(voc, bip))
    out["transform_compile_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(5):
        w, n, wt = fn(voc, bip)
    jax.block_until_ready((w, n, wt))
    out["transform_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 2)
    w = np.asarray(w)
    out["words_resolved_pct"] = round(100.0 * float((w >= 0).mean()), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
