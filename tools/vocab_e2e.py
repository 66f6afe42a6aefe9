"""Stock-scale vocabulary END-TO-END: drive the full System loop fixture
with the 982k-word DBoW2-format vocabulary.

Round-3 verified the big vocabulary's loading and batched descent in
isolation (tools/bench_vocab_scale.py); this closes the remaining gap —
BoW gating selectivity at realistic vocabulary scale inside the real
engine: tracking BoW fallback, keyframe-database loop detection,
Sim3-stage SearchByBoW all run against the 1.1M-node tree, on the same
circuit fixture tests/test_loop_e2e.py gates with the synthetic 512-word
vocabulary (zero keyframe-policy overrides).

Usage: JAX_PLATFORMS=cpu python tools/vocab_e2e.py [n_frames]
Prints one JSON line per vocabulary (big + synthetic-512 control).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS") or "cpu")

import numpy as np

from orb_slam_cuda_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from orb_slam_cuda_tpu.engine import Sensor, System, SystemConfig
from orb_slam_cuda_tpu.geometry.camera import Camera
from orb_slam_cuda_tpu.utils import synthetic
from orb_slam_cuda_tpu.utils.evaluation import ate_rmse, camera_centers

W, H = 320, 240
N = int(sys.argv[1]) if len(sys.argv) > 1 else 360


def ensure_big_vocab():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import bench_vocab_scale as bvs

    if not os.path.exists(bvs.PATH):
        print("generating stock-size vocabulary...", file=sys.stderr)
        bvs.generate(bvs.PATH)
    return bvs.PATH


def run(vocab, tag):
    rng = np.random.default_rng(7)
    cam = Camera.create(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2,
                        width=W, height=H)
    scene = synthetic.room_scene(rng, half_size=9.0, tex_size=1024, n_walls=8)
    poses = synthetic.circuit_trajectory(N, radius=5.0, laps=1.3)
    cfg = SystemConfig(
        camera=cam, sensor=Sensor.MONOCULAR, n_features=800,
        max_keyframes=128, max_points=16384, enable_loop_closing=True,
        max_frames_between_kf=30, min_frames_between_kf=0,
    )
    slam = System(cfg, seed=1, vocab=vocab)
    K = np.asarray(cam.K)
    gt = []
    t0 = time.time()
    for i, T in enumerate(poses):
        slam.track_monocular(scene.render(K, T, W, H), i * 0.1)
        gt.append((i * 0.1, np.linalg.inv(T)[:3, 3]))
    ts, est = camera_centers(slam.get_trajectory())
    gt_map = dict((round(t, 6), c) for t, c in gt)
    gta = np.asarray([gt_map[round(t, 6)] for t in ts])
    st = slam.get_status()
    print(json.dumps({
        "metric": f"vocab_e2e_{tag}",
        "n_words": slam.vocab.n_words,
        "frames": N,
        "tracked_ratio": st["tracked_ratio"],
        "keyframes": st["keyframes"],
        "loops_closed": st["loops_closed"],
        "ate_rmse": round(float(ate_rmse(est, gta)), 4),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


def main():
    from orb_slam_cuda_tpu.vocab import load_orbvoc_text

    path = ensure_big_vocab()
    t0 = time.time()
    voc = load_orbvoc_text(path)
    print(f"vocabulary loaded in {time.time()-t0:.1f}s "
          f"({voc.n_words} words)", file=sys.stderr)
    run(voc, "stock_982k")
    run(None, "synthetic_512")  # engine builds its default synthetic vocab


if __name__ == "__main__":
    main()
