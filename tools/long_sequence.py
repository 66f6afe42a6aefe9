"""Long-sequence system run: >=500 frames, multiple loop closures, ATE.

Generates a TUM-format dataset (octagonal textured room, 2.2
forward-circuit laps -> two revisit events) under /tmp, drives it
through the REAL CLI entry point (`python -m orb_slam_cuda_tpu.run`,
the L6 layer — reference Examples/Monocular/mono_tum.cc), and scores
the saved TUM trajectory against ground truth: sustained mapping +
keyframe culling + loop closing + global BA over hundreds of frames
under the REFERENCE keyframe policy — zero kf_ref_ratio /
kf_cull_redundancy / cadence overrides (round-4 VERDICT item 1).

Usage:  python tools/long_sequence.py            (runs on default backend)
        LONGSEQ_FRAMES=520 python tools/long_sequence.py
Prints one JSON line on stdout; run.py diagnostics stream to stderr.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 320, 240
FX = 260.0
N_FRAMES = int(os.environ.get("LONGSEQ_FRAMES", "520"))
LAPS = 2.2  # two revisit events per run
ROOT = f"/tmp/longseq_{N_FRAMES}"


def generate():
    import cv2

    from orb_slam_cuda_tpu.utils import synthetic

    rng = np.random.default_rng(7)
    scene = synthetic.room_scene(rng, half_size=9.0, tex_size=1024, n_walls=8)
    poses = synthetic.circuit_trajectory(
        N_FRAMES, radius=5.0, laps=LAPS
    )
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float64)
    os.makedirs(f"{ROOT}/rgb", exist_ok=True)
    rgb_lines, gt_lines = [], []
    for i, T in enumerate(poses):
        img = scene.render(K, T, W, H)
        cv2.imwrite(f"{ROOT}/rgb/{i:06d}.png", np.asarray(img))
        ts = i / 10.0
        rgb_lines.append(f"{ts:.6f} rgb/{i:06d}.png")
        Twc = np.linalg.inv(T)
        c = Twc[:3, 3]
        # TUM gt: tx ty tz qx qy qz qw.
        Rm = Twc[:3, :3]
        qw = np.sqrt(max(0.0, 1 + Rm[0, 0] + Rm[1, 1] + Rm[2, 2])) / 2
        qx = (Rm[2, 1] - Rm[1, 2]) / (4 * qw + 1e-12)
        qy = (Rm[0, 2] - Rm[2, 0]) / (4 * qw + 1e-12)
        qz = (Rm[1, 0] - Rm[0, 1]) / (4 * qw + 1e-12)
        gt_lines.append(
            f"{ts:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
            f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}"
        )
    open(f"{ROOT}/rgb.txt", "w").write("\n".join(rgb_lines) + "\n")
    open(f"{ROOT}/groundtruth.txt", "w").write("\n".join(gt_lines) + "\n")
    open(f"{ROOT}/settings.yaml", "w").write(f"""%YAML:1.0
Camera.fx: {FX}
Camera.fy: {FX}
Camera.cx: {W / 2}
Camera.cy: {H / 2}
Camera.width: {W}
Camera.height: {H}
Camera.fps: 10.0
ORBextractor.nFeatures: 800
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
SLAM.max_keyframes: 256
SLAM.max_points: 32768
# pipeline_lag hides LINK latency (TPU tunnel); this tool runs on CPU
# where the DEVICE is the bottleneck and lag-stale keyframe decisions
# cost robustness for zero throughput (66%/0 loops at lag 3 vs 97%/1
# loop sync) - see SystemConfig.pipeline_lag.
SLAM.pipeline_lag: 0
""")


def main():
    if not os.path.exists(f"{ROOT}/rgb.txt"):
        print("generating dataset...", file=sys.stderr)
        generate()
    traj = f"{ROOT}/traj.txt"
    t0 = time.perf_counter()
    proc = subprocess.run(
        [
            sys.executable, "-m", "orb_slam_cuda_tpu.run",
            "--dataset", "tum", "--sensor", "mono",
            "--sequence", ROOT, "--settings", f"{ROOT}/settings.yaml",
            "--save-tum", traj,
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=5400,
    )
    wall = time.perf_counter() - t0
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        print(json.dumps({"metric": "long_sequence", "error": proc.returncode}))
        sys.exit(1)
    loops = 0
    tracked_pct = None
    for line in proc.stderr.splitlines():
        if line.startswith("loops closed:"):
            loops = int(line.split(":")[1])
        if line.startswith("tracked "):
            tracked_pct = float(line.split("(")[1].split("%")[0])

    from orb_slam_cuda_tpu.utils.evaluation import ate_rmse

    est_rows = np.loadtxt(traj)
    gt_rows = np.loadtxt(f"{ROOT}/groundtruth.txt")
    gt_map = {round(t, 6): p for t, *p in gt_rows[:, :4]}
    est, gt = [], []
    for t, x, y, z, *_ in est_rows:
        key = round(t, 6)
        if key in gt_map:
            est.append([x, y, z])
            gt.append(gt_map[key])
    ate = ate_rmse(np.asarray(est), np.asarray(gt))
    print(json.dumps({
        "metric": "long_sequence_ate_rmse",
        "value": round(float(ate), 4),
        "unit": "m (sim3-aligned, room scale 9m)",
        "frames": N_FRAMES,
        "tracked_pct": tracked_pct,
        "loops_closed": loops,
        "wall_s": round(wall, 1),
        "fps": round(N_FRAMES / wall, 2),
    }))


if __name__ == "__main__":
    main()
