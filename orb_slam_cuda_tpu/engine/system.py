"""System facade: the public API of the engine.

Replaces the reference's `System` (reference: src/System.cc): owns the
extractor, vocabulary, map state, tracker state machine and local mapper;
exposes TrackMonocular/TrackStereo/TrackRGBD-equivalent entry points and
trajectory export hooks. Where the reference spawns LocalMapping/
LoopClosing threads (src/System.cc:106-124), this engine currently runs
mapping synchronously per keyframe on the host thread while all heavy
steps execute on-device; loop closing lives in engine/loop_closing.py.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..frontend import ExtractorConfig, ORBExtractor
from ..geometry.camera import Camera
from ..matching import search
from ..slam_map import MapConfig, keyframe_db, ops as map_ops, state as mstate
from ..solvers import bundle_adjust as ba
from ..solvers import initializer as init_solver
from ..vocab import build_vocabulary
from . import local_mapping, tracking
from .frame import FrameData, build_frame


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0  # reference Tracking.h:60
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclass
class SystemConfig:
    camera: Camera = None
    sensor: Sensor = Sensor.MONOCULAR
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    max_keyframes: int = 128
    max_points: int = 16384
    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 30  # reference: camera fps
    vocab_words: int = 512  # synthetic vocab (k^depth) when none supplied
    # Reference requires >=100 init matches with a dedicated 2x-feature
    # extractor (src/Tracking.cc:127-133, :663); with a single extractor
    # the level-0 quota is half, so the gate scales accordingly.
    init_min_matches: int = 60
    init_min_triangulated: int = 40
    # Stereo/RGBD: close-point threshold = th_depth_factor * baseline
    # (reference ThDepth = mbf * factor / fx, src/Tracking.cc:103-109) and
    # the minimum feature count for stereo bootstrap (:581).
    th_depth_factor: float = 35.0
    stereo_init_min_features: int = 500
    depth_map_factor: float = 1.0
    enable_loop_closing: bool = True
    loop_min_kfs: int = 10  # reference: map must have >10 KFs (LoopClosing.cc:131)
    # KeyFrameCulling redundancy threshold (reference hardcodes 0.9,
    # src/LocalMapping.cc:668-736). >1 disables keyframe culling.
    kf_cull_redundancy: float = 0.9


@dataclass
class TrackStats:
    n_frames: int = 0
    n_tracked: int = 0
    n_lost: int = 0
    n_keyframes: int = 0
    n_reloc: int = 0


class System:
    """End-to-end SLAM engine (reference System.cc:32-135 ctor)."""

    def __init__(self, config: SystemConfig, vocab=None, seed: int = 0):
        self.cfg = config
        cam = config.camera
        assert cam is not None, "SystemConfig.camera required"
        self.cam = cam
        self.extractor = ORBExtractor(
            ExtractorConfig(
                n_features=config.n_features,
                scale_factor=config.scale_factor,
                n_levels=config.n_levels,
                ini_th_fast=config.ini_th_fast,
                min_th_fast=config.min_th_fast,
            ),
            cam.height,
            cam.width,
        )
        self.map_cfg = MapConfig(
            max_keyframes=config.max_keyframes,
            max_features=config.n_features,
            max_points=config.max_points,
            n_levels=config.n_levels,
            scale_factor=config.scale_factor,
        )
        if vocab is None:
            # Deterministic synthetic vocabulary: a random-projection-style
            # partition of descriptor space. Adequate for BoW gating and
            # synthetic-scene loop closure; load_orbvoc_text() for real data.
            rng = np.random.default_rng(seed)
            train = rng.integers(0, 2**32, size=(4096, 8), dtype=np.uint32)
            k = 8
            import math

            depth = max(2, int(round(math.log(config.vocab_words) / math.log(k))))
            vocab = build_vocabulary(train, k=k, depth=depth, levelsup=max(1, depth - 2))
        self.vocab = vocab

        # Fused extraction + frame build (undistort + BoW + bipolar) as a
        # single jitted closure: one device dispatch per frame, no eager
        # ops (each eager op is a separate dispatch on-device).
        import jax as _jax

        _cam = cam
        _vocab = self.vocab
        _extract_impl = self.extractor._extract_impl

        def _frame_fn(image):
            feats = _extract_impl(image)
            return build_frame(feats, _cam, _vocab)

        self._frame_fn = _jax.jit(_frame_fn)

        _scale_factors_c = tuple(self.map_cfg.scale_factors)

        def _stereo_frame_fn(left, right):
            from . import stereo as stereo_mod
            from ..ops import hamming as _hamming

            lf = _extract_impl(left)
            rf = _extract_impl(right)
            frame = build_frame(lf, _cam, _vocab)
            ur, depth = stereo_mod.match_stereo(
                frame.uv, frame.oct, frame.bip, frame.valid,
                rf.uv, rf.octave, _hamming.bipolar(rf.desc), rf.valid,
                _cam, _scale_factors_c,
                left_img=left, right_img=right,
            )
            return frame._replace(right=ur, depth=depth)

        self._stereo_frame_fn = _jax.jit(_stereo_frame_fn)

        def _rgbd_frame_fn(image, depth_map, depth_factor):
            from . import stereo as stereo_mod

            feats = _extract_impl(image)
            frame = build_frame(feats, _cam, _vocab)
            depth = stereo_mod.depth_from_rgbd(
                frame.uv_raw, frame.valid, depth_map, _cam, depth_factor
            )
            ur = stereo_mod.virtual_right(frame.uv, depth, _cam)
            return frame._replace(right=ur, depth=depth)

        self._rgbd_frame_fn = _jax.jit(_rgbd_frame_fn)

        self.state = mstate.empty(self.map_cfg)
        self.db = keyframe_db.empty(config.max_keyframes, config.n_features)
        self.mapper = local_mapping.LocalMapper(
            self.map_cfg, cam, kf_cull_redundancy=config.kf_cull_redundancy
        )
        self.scale_factors = jnp.asarray(self.map_cfg.scale_factors, jnp.float32)

        self.tracking_state = TrackingState.NO_IMAGES_YET
        self.velocity: Optional[np.ndarray] = None
        self.last_pose: Optional[np.ndarray] = None
        self.last_frame: Optional[FrameData] = None
        self.init_frame: Optional[FrameData] = None
        self.ref_kf: int = 0
        self.kf_order: List[int] = []
        self.recent_pts: List[tuple] = []  # (point_slot, kf_count_at_birth)
        self._next_kf_slot = 0
        self.frame_id: int = 0
        self.frames_since_kf: int = 0
        self.trajectory: List[tuple] = []  # (timestamp, Tcw 4x4 np, ok)
        self.kf_timestamps = {}
        self.localization_only = False
        self.stats = TrackStats()
        from ..utils.timing import StageTimer

        self.timer = StageTimer(enabled=True)
        self.loop_closer = None
        if config.enable_loop_closing:
            from .loop_closing import LoopCloser

            self.loop_closer = LoopCloser(
                self.map_cfg, cam, self.vocab,
                fix_scale=config.sensor != Sensor.MONOCULAR,
            )
        baseline = float(np.asarray(cam.bf)) / float(np.asarray(cam.fx)) if float(np.asarray(cam.bf)) > 0 else 0.0
        self.th_depth = config.th_depth_factor * baseline

    # ------------------------------------------------------------------
    def track_monocular(self, image: np.ndarray, timestamp: float):
        """Reference System::TrackMonocular -> Tracking::GrabImageMonocular
        (src/System.cc:257-307, src/Tracking.cc:287-323). Returns 4x4 Tcw
        (np.ndarray) or None while uninitialized/lost."""
        assert self.cfg.sensor == Sensor.MONOCULAR
        self.timer.set_frame(self.frame_id)
        with self.timer.stage("times.csv", "orb_extract"):
            frame = self._frame_fn(image)  # numpy in: jit transfers async
        with self.timer.stage("timesTracking.csv", "track", sync=None):
            pose = self._track(frame, timestamp)
        self.frame_id += 1
        return pose

    def track_stereo(self, left: np.ndarray, right: np.ndarray, timestamp: float):
        """Reference System::TrackStereo -> GrabImageStereo
        (src/System.cc:165-215, src/Tracking.cc:222-252): extract both
        views (the reference uses two CPU threads, Frame.cc:77-78; here
        both run through the same compiled extractor), associate stereo
        depth, then track."""
        assert self.cfg.sensor == Sensor.STEREO
        self.timer.set_frame(self.frame_id)
        with self.timer.stage("times.csv", "orb_extract_stereo"):
            frame = self._stereo_frame_fn(left, right)
        if self.tracking_state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            pose = self._depth_initialize(frame)
            self.trajectory.append((timestamp, pose.copy() if pose is not None else None, pose is not None))
            self.frame_id += 1
            return pose
        pose = self._track(frame, timestamp)
        self.frame_id += 1
        return pose

    def track_rgbd(self, image: np.ndarray, depth_map: np.ndarray, timestamp: float):
        """Reference System::TrackRGBD -> GrabImageRGBD
        (src/System.cc:216-256, src/Tracking.cc:254-285)."""
        assert self.cfg.sensor == Sensor.RGBD
        self.timer.set_frame(self.frame_id)
        with self.timer.stage("times.csv", "orb_extract_rgbd"):
            frame = self._rgbd_frame_fn(
                image, depth_map, np.float32(self.cfg.depth_map_factor),
            )
        if self.tracking_state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            pose = self._depth_initialize(frame)
            self.trajectory.append((timestamp, pose.copy() if pose is not None else None, pose is not None))
            self.frame_id += 1
            return pose
        pose = self._track(frame, timestamp)
        self.frame_id += 1
        return pose

    def _depth_initialize(self, frame: FrameData):
        """StereoInitialization (reference src/Tracking.cc:579-633): one
        keyframe at the origin; every feature with depth becomes a map
        point immediately."""
        from ..geometry import camera as cam_mod

        n_valid = int(np.asarray(jnp.sum(frame.valid)))
        if n_valid < self.cfg.stereo_init_min_features:
            return None
        depth_n = np.asarray(frame.depth)
        good = (depth_n > 0) & np.asarray(frame.valid)
        sel = np.flatnonzero(good)
        if len(sel) < 100:
            return None
        T0 = np.eye(4, dtype=np.float32)
        slot = 0
        pt_slots = np.arange(len(sel), dtype=np.int32)
        mp_row = np.full(frame.capacity, -1, np.int32)
        mp_row[sel] = pt_slots
        st = mstate.insert_keyframe(
            self.state, slot, jnp.asarray(T0), self.frame_id,
            frame.uv, frame.right, frame.depth, frame.oct, frame.ang,
            frame.desc, frame.valid, frame.word, frame.node,
            jnp.asarray(mp_row),
        )
        sel_j = jnp.asarray(sel)
        xyz = cam_mod.backproject(self.cam, frame.uv[sel_j], frame.depth[sel_j])
        st = mstate.add_points(
            st, jnp.asarray(pt_slots), xyz,
            jnp.ones((len(sel),), bool), frame.desc[sel_j],
            jnp.zeros((len(sel), 3), jnp.float32),
            jnp.zeros((len(sel),), jnp.float32),
            jnp.full((len(sel),), 1e9, jnp.float32),
            jnp.full((len(sel),), slot, jnp.int32),
            jnp.full((len(sel),), slot, jnp.int32),
        )
        st = map_ops.update_point_stats(st, self.map_cfg)
        wu, wt = keyframe_db.compute_bow_row(frame.word, frame.idf, frame.valid)
        self.db = keyframe_db.insert(self.db, slot, wu, wt)
        self.state = st
        self.kf_order = [slot]
        self._next_kf_slot = 1
        self.mapper._next_pt_slot = len(sel)
        self.mapper.mp_valid_host[:] = False
        self.mapper.note_points_added(pt_slots)
        self.recent_pts = []
        self.ref_kf = slot
        self.last_pose = T0
        self.velocity = None
        self.last_frame = frame._replace(mp=jnp.asarray(mp_row))
        self.tracking_state = TrackingState.OK
        self.frames_since_kf = 0
        self.stats.n_keyframes = 1
        return T0

    # ------------------------------------------------------------------
    def _track(self, frame: FrameData, timestamp: float):
        self.stats.n_frames += 1
        if self.tracking_state in (
            TrackingState.NO_IMAGES_YET,
            TrackingState.NOT_INITIALIZED,
        ):
            pose = self._try_initialize(frame)
            self.trajectory.append(
                (timestamp, pose.copy() if pose is not None else None,
                 pose is not None)
            )
            return pose

        ok = False
        pose = None
        if self.tracking_state == TrackingState.OK:
            # Fused one-dispatch tracking step (motion model + ref-KF
            # fallback + local map + stats); the host pulls one scalar
            # vector and the 4x4 pose.
            lf = self.last_frame
            if self.velocity is not None:
                pose_pred = self.velocity @ self.last_pose
            else:
                pose_pred = self.last_pose
            radius = (
                tracking.MOTION_MODEL_RADIUS_STEREO
                if self.cfg.sensor == Sensor.STEREO
                else tracking.MOTION_MODEL_RADIUS
            )
            min_obs = 3 if len(self.kf_order) > 2 else 2
            # Args go in as host numpy (jit transfers them asynchronously;
            # explicit device_put/jnp.asarray would add a blocking push
            # each through a high-latency link).
            res = tracking.full_track_step(
                self.state, frame,
                pose_pred.astype(np.float32),
                self.last_pose.astype(np.float32),
                lf.uv, lf.oct, lf.ang, lf.bip, lf.mp,
                np.int32(self.ref_kf), np.int32(min_obs),
                self.cam, self.scale_factors, radius,
            )
            vec = np.asarray(res.host_vec)  # the frame's ONE device pull
            scal = vec[:7].astype(np.int64)
            ok = bool(scal[0])
            self.state = self.state._replace(
                mp_visible=res.mp_visible, mp_found=res.mp_found
            )
            self.ref_kf = int(scal[2])
            self.n_inliers_local = int(scal[1])
            self.ref_tracked = int(scal[3])
            if ok:
                pose = vec[7:23].reshape(4, 4).copy()
                self.last_frame = frame._replace(mp=res.mp)
        if self.tracking_state == TrackingState.LOST or not ok:
            pose, ok = self._relocalize(frame)
            if ok:
                self.stats.n_reloc += 1
                pose2, ok = self._track_local_map(frame, pose)
                if ok:
                    pose = pose2

        if ok:
            self.tracking_state = TrackingState.OK
            self.stats.n_tracked += 1
            if self.velocity is None or self.last_pose is None:
                self.velocity = None
            if self.last_pose is not None:
                self.velocity = pose @ np.linalg.inv(self.last_pose)
            self.last_pose = pose
            # NOTE: self.last_frame already carries the refreshed map-point
            # bindings (set inside _track_local_map); do not overwrite it
            # with the binding-less input frame.
            self.frames_since_kf += 1
            if not self.localization_only and self._need_new_keyframe(frame):
                self._create_keyframe(frame)
                self.kf_timestamps[self.ref_kf] = timestamp
        else:
            self.tracking_state = TrackingState.LOST
            self.stats.n_lost += 1
            self.velocity = None
            # Lost right after initialization -> full reset (reference
            # src/Tracking.cc:379-382,537-544: <=5 KFs -> System::Reset).
            if 0 < len(self.kf_order) <= 5 and not self.localization_only:
                self.reset()

        self.trajectory.append(
            (timestamp, pose.copy() if ok else None, bool(ok))
        )
        return pose if ok else None

    # ------------------------------------------------------------------
    def _try_initialize(self, frame: FrameData):
        n_valid = int(np.asarray(jnp.sum(frame.valid)))
        min_feats = 2 * self.cfg.init_min_matches
        if self.tracking_state == TrackingState.NO_IMAGES_YET or self.init_frame is None:
            if n_valid >= min_feats:
                self.init_frame = frame
                self.tracking_state = TrackingState.NOT_INITIALIZED
            return None

        if n_valid < min_feats:
            self.init_frame = None
            return None

        f1 = self.init_frame
        m = search.for_initialization(
            f1.uv, f1.bip, f1.valid, f1.ang,
            frame.uv, frame.bip, frame.valid, frame.ang, frame.oct,
            f1.oct, window=100.0,
        )
        idx = np.asarray(m.idx)
        matched = idx >= 0
        if matched.sum() < self.cfg.init_min_matches:  # reference: <100 resets (Tracking.cc:663)
            self.init_frame = frame if n_valid >= min_feats else None
            return None

        import jax

        xy1 = f1.uv
        xy2 = frame.uv[jnp.clip(m.idx, 0)]
        res = init_solver.initialize_two_view(
            xy1, xy2, jnp.asarray(matched), self.cam.K,
            jax.random.PRNGKey(self.frame_id),
            min_triangulated=self.cfg.init_min_triangulated,
        )
        if not bool(res.success):
            return None

        pose1 = self._create_initial_map(f1, frame, m, res)
        return pose1

    def _create_initial_map(self, f1: FrameData, f2: FrameData, m, res):
        """CreateInitialMapMonocular (reference src/Tracking.cc:709-812):
        two keyframes, triangulated points, full BA, median-depth scale
        normalization."""
        R = np.asarray(res.R)
        t = np.asarray(res.t)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = R
        T2[:3, 3] = t

        is_pt = np.asarray(res.is_point)
        pts = np.asarray(res.points)
        idx2 = np.asarray(m.idx)
        sel = np.flatnonzero(is_pt & (idx2 >= 0))
        n_new = len(sel)
        if n_new < self.cfg.init_min_triangulated:
            return None

        # Median-depth normalization (reference :780-800).
        med_depth = float(np.median(pts[sel][:, 2]))
        if med_depth <= 0:
            return None
        inv_med = 1.0 / med_depth
        T2[:3, 3] *= inv_med
        pts_n = pts * inv_med

        st = self.state
        slot1, slot2 = 0, 1
        mp1 = np.full(f1.capacity, -1, np.int32)
        mp2 = np.full(f2.capacity, -1, np.int32)
        pt_slots = np.arange(n_new, dtype=np.int32)
        mp1[sel] = pt_slots
        mp2[idx2[sel]] = pt_slots

        for slot, fr, T, mp in (
            (slot1, f1, T1, mp1),
            (slot2, f2, T2, mp2),
        ):
            st = mstate.insert_keyframe(
                st, slot, jnp.asarray(T), self.frame_id - (1 if slot == slot1 else 0),
                fr.uv, fr.right, fr.depth, fr.oct, fr.ang, fr.desc,
                fr.valid, fr.word, fr.node, jnp.asarray(mp),
            )
        st = mstate.add_points(
            st,
            jnp.asarray(pt_slots),
            jnp.asarray(pts_n[sel], jnp.float32),
            jnp.ones((n_new,), bool),
            f1.desc[jnp.asarray(sel)],
            jnp.zeros((n_new, 3), jnp.float32),
            jnp.zeros((n_new,), jnp.float32),
            jnp.full((n_new,), 1e9, jnp.float32),
            jnp.full((n_new,), slot1, jnp.int32),
            jnp.full((n_new,), slot1, jnp.int32),
        )
        st = map_ops.update_point_stats(st, self.map_cfg)

        # Full BA on the 2-view map (reference GlobalBundleAdjustemnt(20)).
        problem, cam_slots, pt_slots_j = local_mapping.gather_local_ba_problem(
            st, slot2, self.cam, 1.0 / jnp.asarray(self.map_cfg.level_sigma2),
            n_local=2, n_fixed=1, n_points=min(4096, self.map_cfg.max_points),
        )
        result = ba.bundle_adjust(problem, self.cam, lm_iters=20, cg_iters=20)
        st = local_mapping.scatter_ba_result(st, result, problem, cam_slots, pt_slots_j)

        # Register BoW rows.
        db = self.db
        for slot, fr in ((slot1, f1), (slot2, f2)):
            wu, wt = keyframe_db.compute_bow_row(fr.word, fr.idf, fr.valid)
            db = keyframe_db.insert(db, slot, wu, wt)

        self.state = st
        self.db = db
        self.kf_order = [slot1, slot2]
        self._next_kf_slot = 2
        self.recent_pts = [(int(p), 2) for p in pt_slots]
        self.mapper._next_pt_slot = int(pt_slots[-1]) + 1
        self.mapper.mp_valid_host[:] = False
        self.mapper.note_points_added(pt_slots)
        self.ref_kf = slot2
        pose2 = np.asarray(st.kf_pose[slot2])
        self.last_pose = pose2
        self.velocity = None
        self.last_frame = f2._replace(mp=st.kf_mp[slot2])
        self.tracking_state = TrackingState.OK
        self.frames_since_kf = 0
        self.stats.n_keyframes = 2
        return pose2

    # ------------------------------------------------------------------
    def _track_from_last(self, frame: FrameData):
        lf = self.last_frame
        if self.velocity is not None:
            pose_pred = jnp.asarray(self.velocity @ self.last_pose)
        else:
            pose_pred = jnp.asarray(self.last_pose)
        radius = (
            tracking.MOTION_MODEL_RADIUS_STEREO
            if self.cfg.sensor == Sensor.STEREO
            else tracking.MOTION_MODEL_RADIUS
        )
        pose, mp, n_matches, n_inl = tracking.track_motion_model(
            self.state, frame, pose_pred,
            lf.uv, lf.oct, lf.ang, lf.bip, lf.mp,
            self.cam, self.scale_factors, radius,
        )
        if int(n_matches) >= tracking.MIN_MATCHES_MOTION and int(n_inl) >= tracking.MIN_INLIERS_TRACK:
            self.last_frame = frame  # bindings set below by caller
            frame_mp = mp
            self.last_frame = frame._replace(mp=frame_mp)
            return np.asarray(pose), True

        # Fallback: reference keyframe tracking (reference Tracking.cc:352).
        pose, mp, n_matches, n_inl = tracking.track_reference_kf(
            self.state, frame, jnp.asarray(self.last_pose), self.ref_kf, self.cam
        )
        if int(n_matches) >= tracking.MIN_MATCHES_REF_KF and int(n_inl) >= tracking.MIN_INLIERS_TRACK:
            self.last_frame = frame._replace(mp=mp)
            return np.asarray(pose), True
        return None, False

    def _relocalize(self, frame: FrameData):
        """Relocalization (reference src/Tracking.cc:1427-1600): BoW
        candidates from the database, BoW matching + P3P/EPnP RANSAC."""
        from . import relocalization

        pose, mp, ok = relocalization.relocalize(
            self.state, self.db, frame, self.cam, self.vocab.n_words,
            self.scale_factors,
        )
        if not ok:
            return None, False
        self.last_frame = frame._replace(mp=mp)
        return np.asarray(pose), True

    def _track_local_map(self, frame: FrameData, pose):
        frame = self.last_frame  # bindings refreshed by the previous step
        kf_mask, pt_mask, ref_kf = tracking.assemble_local_map(
            self.state, frame.mp
        )
        self.ref_kf = int(ref_kf)
        pose2, mp, n_inl, n_visible, visible = tracking.track_local_map(
            self.state, frame, jnp.asarray(pose), pt_mask, self.cam,
            self.scale_factors, 1.0,
        )
        # Visibility statistics (reference IncreaseVisible/IncreaseFound).
        self.state = map_ops.increase_visible(
            self.state,
            jnp.where(visible, jnp.arange(visible.shape[0], dtype=jnp.int32), -1),
        )
        self.state = map_ops.increase_found(self.state, mp)
        self.last_frame = frame._replace(mp=mp)
        self.n_inliers_local = int(n_inl)
        if int(n_inl) >= tracking.MIN_INLIERS_LOCAL:
            return np.asarray(pose2), True
        return np.asarray(pose2), False

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame: FrameData) -> bool:
        """Reference NeedNewKeyFrame (src/Tracking.cc:1057-1145),
        simplified to the dominant mono conditions: enough frames since
        the last KF or tracking weakening vs the reference keyframe."""
        if len(self.kf_order) == 0:
            return False
        ref_tracked = getattr(self, "ref_tracked", None)
        if ref_tracked is None:
            min_obs = 3 if len(self.kf_order) > 2 else 2
            ref_tracked = int(
                tracking.count_ref_tracked(self.state, self.ref_kf, min_obs)
            )
        inliers = self.n_inliers_local
        c1a = self.frames_since_kf >= self.cfg.max_frames_between_kf
        c1b = self.frames_since_kf >= self.cfg.min_frames_between_kf
        c2 = (inliers < ref_tracked * 0.9) and inliers > 15
        return (c1a or (c1b and c2)) and inliers > 15

    def _create_keyframe(self, frame: FrameData):
        """CreateNewKeyFrame + synchronous local mapping (reference
        src/Tracking.cc:1146-1228 + LocalMapping::Run body)."""
        frame = self.last_frame
        # kf_order is the exact set of live keyframes (mapper culls keep
        # it in sync), so slot allocation needs no device pull.
        kf_valid = np.zeros(self.cfg.max_keyframes, bool)
        kf_valid[self.kf_order] = True
        free = np.flatnonzero(~kf_valid)
        if len(free) == 0:
            raise RuntimeError(
                f"keyframe capacity exhausted ({self.cfg.max_keyframes})"
            )
        # Rotating allocation: avoid immediately recycling culled slots
        # (stale mp_first_kf/mp_ref_kf references must age out first).
        pos = np.searchsorted(free, self._next_kf_slot)
        free = np.concatenate([free[pos:], free[:pos]])
        slot = int(free[0])
        self._next_kf_slot = (slot + 1) % self.cfg.max_keyframes
        self.state = mstate.insert_keyframe(
            self.state, slot, jnp.asarray(self.last_pose), self.frame_id,
            frame.uv, frame.right, frame.depth, frame.oct, frame.ang,
            frame.desc, frame.valid, frame.word, frame.node, frame.mp,
        )
        if self.cfg.sensor != Sensor.MONOCULAR:
            self._create_depth_points(slot)
        wu, wt = keyframe_db.compute_bow_row(frame.word, frame.idf, frame.valid)
        self.db = keyframe_db.insert(self.db, slot, wu, wt)
        self.kf_order.append(slot)
        self.ref_kf = slot
        self.frames_since_kf = 0
        self.stats.n_keyframes += 1

        with self.timer.stage("timesMapping.csv", "local_mapping"):
            self.state, self.db = self.mapper.process_keyframe(
                self.state, self.db, slot, self.recent_pts, self.kf_order
            )
        # Keyframe culling may have invalidated the ref.
        if self.ref_kf not in self.kf_order:
            self.ref_kf = self.kf_order[-1]

        if self.loop_closer is not None and len(self.kf_order) > 3:
            with self.timer.stage("timesMapping.csv", "loop_closing"):
                self.state, self.db = self.loop_closer.process(
                    self.state, self.db, slot, self.kf_order
                )

    def _create_depth_points(self, slot: int):
        """Stereo/RGBD keyframes spawn points for unbound close features
        (reference CreateNewKeyFrame depth branch, src/Tracking.cc:
        1170-1220) — fixed-shape jitted insertion, one scalar pull."""
        MAX_NEW = 512
        slots = self.mapper.peek_point_slots(self.state, MAX_NEW)
        self.state, n_used = local_mapping.create_depth_points(
            self.state, jnp.int32(slot), self.cam,
            jnp.float32(self.th_depth), jnp.asarray(slots, jnp.int32),
            max_new=MAX_NEW,
        )
        n_used = int(n_used)
        self.mapper.advance_point_slots(slots, n_used)
        self.mapper.note_points_added(slots[:n_used])
        born = len(self.kf_order) + 1
        self.recent_pts.extend((int(p), born) for p in slots[:n_used])

    # ------------------------------------------------------------------
    def get_trajectory(self):
        """[(timestamp, Tcw or None, ok)] for export (reference
        SaveTrajectoryTUM/KITTI source data, src/System.cc:361-511)."""
        return self.trajectory

    def tracked_ratio(self):
        return self.stats.n_tracked / max(self.stats.n_frames, 1)

    # ------------------------------------------------------------------
    def map_changed(self) -> bool:
        """True once per map mutation epoch (reference System::MapChanged
        served over the ROS query/response channel, src/System.cc:123-125 +
        Examples/ROS ros_mono.cc:148-159 AnswerQuery)."""
        idx = self.stats.n_keyframes + (
            self.loop_closer.n_loops_closed if self.loop_closer else 0
        )
        changed = idx != getattr(self, "_last_map_change_idx", -1)
        self._last_map_change_idx = idx
        return changed

    def get_status(self) -> dict:
        """Health snapshot (the observability counterpart of the
        reference's ROS status topic + shutdown printouts)."""
        return {
            "state": self.tracking_state.name,
            "frames": self.stats.n_frames,
            "tracked_ratio": round(self.tracked_ratio(), 4),
            "keyframes": self.stats.n_keyframes,
            "relocalizations": self.stats.n_reloc,
            "loops_closed": (
                self.loop_closer.n_loops_closed if self.loop_closer else 0
            ),
            "localization_only": self.localization_only,
        }

    # ------------------------------------------------------------------
    def set_localization_mode(self, enabled: bool):
        """Localization-only switching (reference
        ActivateLocalizationMode/DeactivateLocalizationMode,
        include/System.h:83-85 + src/System.cc:265-297): tracking and
        relocalization continue, mapping and loop closing stop."""
        self.localization_only = enabled

    def reset(self):
        """Full system reset (reference System::Reset -> Tracking::Reset,
        src/Tracking.cc:1602-1638: clear map, database, state machine)."""
        self.state = mstate.empty(self.map_cfg)
        self.db = keyframe_db.empty(self.cfg.max_keyframes, self.cfg.n_features)
        self.tracking_state = TrackingState.NO_IMAGES_YET
        self.velocity = None
        self.last_pose = None
        self.last_frame = None
        self.init_frame = None
        self.ref_kf = 0
        self.kf_order = []
        self.recent_pts = []
        self._next_kf_slot = 0
        self.mapper._next_pt_slot = 0
        self.mapper.mp_valid_host[:] = False
        self.frames_since_kf = 0
        if self.loop_closer is not None:
            self.loop_closer.consistent_groups = []
            self.loop_closer.last_loop_kf_order = 0

    def save_trajectory_tum(self, path: str):
        from ..io import trajectory as traj_io

        traj_io.save_trajectory_tum(self.trajectory, path)

    def save_trajectory_kitti(self, path: str):
        from ..io import trajectory as traj_io

        traj_io.save_trajectory_kitti(self.trajectory, path)

    def save_keyframe_trajectory_tum(self, path: str):
        from ..io import trajectory as traj_io

        traj_io.save_keyframe_trajectory_tum(
            self.state, self.kf_order, self.kf_timestamps, path
        )

    def save_map(self, path: str):
        from ..io import checkpoint

        checkpoint.save_system(self, path)

    def load_map(self, path: str, localization_only: bool = True):
        from ..io import checkpoint

        checkpoint.load_into_system(self, path, localization_only)
