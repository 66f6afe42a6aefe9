"""Tests for viewer renders, powermon sampler, timing CSVs, Pallas FAST."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_cuda_tpu.frontend import fast
from orb_slam_cuda_tpu.utils import synthetic
from orb_slam_cuda_tpu.utils.powermon import Powermon
from orb_slam_cuda_tpu.utils.timing import StageTimer


class TestPallasFast:
    def test_matches_jnp_reference(self, rng):
        from orb_slam_cuda_tpu.ops.pallas_fast import fast_score_pallas

        img = synthetic.make_texture(64, 128, rng, n_blobs=40).astype(np.float32)
        hi, lo = fast_score_pallas(jnp.asarray(img), 20.0, 7.0, interpret=True)
        ref_hi = np.asarray(fast.fast_score(jnp.asarray(img), 20.0))
        ref_lo = np.asarray(fast.fast_score(jnp.asarray(img), 7.0))
        np.testing.assert_allclose(np.asarray(hi), ref_hi, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lo), ref_lo, atol=1e-5)


class TestTiming:
    def test_rows_and_flush(self, tmp_path):
        t = StageTimer()
        t.set_frame(3)
        with t.stage("times.csv", "orb_extract", level=0):
            pass
        with t.stage("timesTracking.csv", "track"):
            pass
        paths = t.flush(str(tmp_path))
        assert len(paths) == 2
        rows = open(os.path.join(tmp_path, "times.csv")).read().splitlines()
        assert rows[0] == "frame,name,level,time"
        frame, name, level, ns = rows[1].split(",")
        assert frame == "3" and name == "orb_extract" and level == "0"
        assert int(ns) >= 0
        assert "track" in t.summary("timesTracking.csv")

    def test_disabled_timer_is_noop(self):
        t = StageTimer(enabled=False)
        with t.stage("x.csv", "a"):
            pass
        assert not t.rows


class TestPowermon:
    def test_lifecycle(self):
        pm = Powermon(period_s=0.02)
        assert pm.prepare()
        pm.start_async()
        import time

        time.sleep(0.15)
        pm.stop_async()
        assert len(pm.samples) >= 3
        s = pm.read_sync()
        assert s.t > 0
        import io

        buf = io.StringIO()
        pm.print_stats(file=buf)
        assert "samples" in buf.getvalue()


class TestViewer:
    def test_renders(self, rng, tmp_path):
        pytest.importorskip("matplotlib")
        from orb_slam_cuda_tpu.slam_map import MapConfig, state as mstate
        from orb_slam_cuda_tpu.utils import viewer

        cfg = MapConfig(max_keyframes=4, max_features=16, max_points=64)
        st = mstate.empty(cfg)
        st = st._replace(
            kf_valid=st.kf_valid.at[0].set(True),
            mp_valid=st.mp_valid.at[:10].set(True),
            mp_xyz=st.mp_xyz.at[:10].set(
                jnp.asarray(rng.normal(0, 2, (10, 3)).astype(np.float32))
            ),
        )
        p = viewer.draw_map_topview(st, str(tmp_path / "map.png"))
        assert os.path.getsize(p) > 1000
