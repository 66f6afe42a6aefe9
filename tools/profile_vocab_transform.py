"""On-chip cost of the BoW tree descent at synthetic-512 vs stock-982k
vocabulary scale — bisects the big-vocab fps delta seen in bench.py
(round-4: 55.3 -> ~47.6 fps when BENCH_VOCAB points at the 982k file).

Sustained-window method per PERF.md: dispatch N transforms back-to-back,
block once at the end; wall/N is the per-call device time (the tunnel
round trip amortizes away).

Usage: python tools/profile_vocab_transform.py [/tmp/orbvoc_k10_L6.txt]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(vocab, n_desc=2000, iters=100, tag=""):
    from orb_slam_cuda_tpu.ops import hamming

    rng = np.random.default_rng(0)
    desc = jnp.asarray(rng.integers(0, 2**32, (n_desc, 8), dtype=np.uint32))

    fn = jax.jit(lambda v, b: v.transform(b))
    out = fn(vocab, desc)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(vocab, desc)
    jax.block_until_ready(out)
    per = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag}: {per:.3f} ms/transform ({n_desc} desc)", flush=True)
    return per


def main():
    print("devices:", jax.devices(), flush=True)
    from orb_slam_cuda_tpu.vocab import build_vocabulary, load_orbvoc_text

    rng = np.random.default_rng(1)
    small = build_vocabulary(
        rng.integers(0, 2**32, (4096, 8), dtype=np.uint32), k=8, depth=3,
        levelsup_depth=1,
    )
    measure(small, tag="512-word synthetic (k=8,L=3)")

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/orbvoc_k10_L6.txt"
    t0 = time.time()
    big = load_orbvoc_text(path)
    print(f"982k vocab loaded in {time.time()-t0:.1f}s", flush=True)
    measure(big, tag="982k-word stock-format (k=10,L=6)")


if __name__ == "__main__":
    main()
