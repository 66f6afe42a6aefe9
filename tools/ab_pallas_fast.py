"""A/B the Pallas fused FAST kernel vs the XLA path on the real device.

Measures full-extraction device time both ways at KITTI resolution and
checks the outputs agree. Run on TPU (no JAX_PLATFORMS override).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from orb_slam_cuda_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from orb_slam_cuda_tpu.frontend import ExtractorConfig, ORBExtractor
from orb_slam_cuda_tpu.utils import synthetic

W, H = 1241, 376
REPS = 50

rng = np.random.default_rng(3)
scene = synthetic.PlanarScene.default(rng, depth=12.0, second_depth=25.0,
                                      extent=40.0, tex_size=2048)
K = np.array([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]], np.float32)
img = scene.render(K, np.eye(4), W, H)
img_dev = jax.device_put(img)

print("backend:", jax.default_backend())
results = {}
feats_by_mode = {}
for use_pallas in (False, True):
    cfg = ExtractorConfig(n_features=2000, use_pallas_fast=use_pallas)
    ext = ORBExtractor(cfg, H, W)
    out = ext(img_dev)
    jax.block_until_ready(out.desc)  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = ext(img_dev)
    jax.block_until_ready(out.desc)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    results[use_pallas] = dt
    feats_by_mode[use_pallas] = jax.device_get(out)
    print(f"use_pallas_fast={use_pallas}: {dt:.3f} ms/extraction (incl dispatch)")

a, b = feats_by_mode[False], feats_by_mode[True]
same_valid = (a.valid == b.valid).mean()
uv_close = np.allclose(a.uv[a.valid & b.valid], b.uv[a.valid & b.valid], atol=0.51)
desc_same = (a.desc[a.valid & b.valid] == b.desc[a.valid & b.valid]).mean()
print(f"valid agreement: {same_valid:.4f}; uv close: {uv_close}; "
      f"desc word agreement: {desc_same:.4f}")
print(f"speedup: {results[False] / results[True]:.3f}x")
