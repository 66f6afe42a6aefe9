"""CLI runner smoke test on a generated mini-KITTI-format dataset."""

import os

import numpy as np
import pytest

from orb_slam_cuda_tpu.utils import synthetic

SETTINGS = """%YAML:1.0
Camera.fx: 260.0
Camera.fy: 260.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.fps: 10.0
ORBextractor.nFeatures: 600
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


@pytest.fixture
def mini_kitti(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    scene = synthetic.PlanarScene.default(rng, tex_size=768)
    poses = synthetic.orbit_trajectory(16, radius=0.6)
    K = np.array([[260.0, 0, 160], [0, 260.0, 120], [0, 0, 1]])
    seq = tmp_path / "seq"
    (seq / "image_0").mkdir(parents=True)
    with open(seq / "times.txt", "w") as f:
        for i, T in enumerate(poses):
            img = scene.render(K, T, 320, 240)
            cv2.imwrite(str(seq / "image_0" / f"{i:06d}.png"), img)
            f.write(f"{i*0.1:.6f}\n")
    settings = tmp_path / "settings.yaml"
    settings.write_text(SETTINGS)
    return str(seq), str(settings), tmp_path


def test_mono_kitti_runner(mini_kitti):
    from orb_slam_cuda_tpu.run import main

    seq, settings, tmp = mini_kitti
    traj = str(tmp / "traj_tum.txt")
    kitti_out = str(tmp / "traj_kitti.txt")
    map_out = str(tmp / "map.npz")
    rc = main([
        "--dataset", "kitti", "--sensor", "mono",
        "--sequence", seq, "--settings", settings,
        "--save-tum", traj, "--save-kitti", kitti_out,
        "--save-map", map_out,
        "--timing-dir", str(tmp),
    ])
    assert rc == 0
    assert os.path.exists(traj)
    rows = open(traj).read().strip().splitlines()
    assert len(rows) >= 8  # most frames tracked after init
    assert os.path.exists(map_out)
    assert os.path.exists(str(tmp / "times.csv"))
    assert os.path.exists(str(tmp / "timesTracking.csv"))


def test_status_server(mini_kitti):
    """HTTP status service (reference ROS query/response channel,
    ros_mono.cc:148-159): /status reflects live counters; /map_changed
    is edge-triggered per map mutation epoch."""
    import json
    import urllib.request

    from orb_slam_cuda_tpu.engine import Sensor, System
    from orb_slam_cuda_tpu.io import load_settings
    from orb_slam_cuda_tpu.io.datasets import KittiOdometryDataset
    from orb_slam_cuda_tpu.io.serve import StatusServer

    seq, settings, tmp = mini_kitti
    cfg = load_settings(settings, sensor=Sensor.MONOCULAR)
    slam = System(cfg)
    srv = StatusServer(slam).start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}{path}", timeout=10
            ) as r:
                return json.loads(r.read())

        st0 = get("/status")
        assert st0["state"] == "NO_IMAGES_YET"
        assert get("/map_changed")["map_changed"] is True  # epoch 0 is new
        assert get("/map_changed")["map_changed"] is False  # edge-triggered

        ds = KittiOdometryDataset(seq)
        for i, (t, frame) in enumerate(ds):
            slam.track_monocular(frame["image"], t)
            if i >= 9:
                break
        st1 = get("/status")
        assert st1["frames"] >= 9
        assert st1["keyframes"] >= 2
        assert st1["state"] in ("OK", "LOST", "NOT_INITIALIZED")
        # Keyframes were inserted since the last poll -> edge fires once.
        assert get("/map_changed")["map_changed"] is True
        assert get("/map_changed")["map_changed"] is False

        # Live viewer endpoints (round 5): the HTML page and the map
        # render (reference Viewer/MapDrawer counterpart).
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=30
        ) as r:
            page = r.read()
        assert b"live map" in page
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/map.png", timeout=60
        ) as r:
            png = r.read()
        assert png[:4] == b"\x89PNG", png[:16]
    finally:
        srv.stop()
