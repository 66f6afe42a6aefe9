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
    # NeedNewKeyFrame thRefRatio override (reference hardcodes 0.9 mono /
    # 0.75 stereo / 0.4 tiny maps, src/Tracking.cc:1099-1105). None =
    # those reference values; >1 makes c2 always pass (keyframe cadence
    # then follows the frame-interval conditions alone — useful for
    # fixtures that need dense keyframes).
    kf_ref_ratio: Optional[float] = None
    # Tracking pipeline depth: with lag L > 0, the fused per-frame step is
    # dispatched immediately and its scalar readback is consumed L frames
    # later, hiding the host<->device round trip (the reference hides the
    # same latency with its tracking/mapping thread split,
    # src/System.cc:106-124). 0 = fully synchronous (per-call pose
    # return), the mode unit tests use.
    pipeline_lag: int = 0
    # Asynchronous mapping (the reference's LocalMapping/LoopClosing
    # thread split, src/System.cc:106-124): keyframe mapping work is
    # dispatched without blocking at insertion; its host tail (BA round 2,
    # bookkeeping pull, loop detection) is pumped one unit per subsequent
    # frame, with the reference's mbAbortBA cancellation point between
    # local-BA rounds (src/LocalMapping.cc:141). False = everything
    # completes inside the keyframe's own track call.
    async_mapping: bool = True
    # Device mesh for the distributed back-end (jax.sharding.Mesh or
    # None): when set, global BA at loop closure runs observation-sharded
    # across the mesh (parallel/dist_ba.py) — the BASELINE.json
    # multi-chip capability the single-GPU reference lacks.
    mesh: object = None
    # Pallas fused FAST kernel (ops/pallas_fast.py): default OFF — the
    # XLA path (frontend/fast.py) is the production default; enable only
    # after tools/ab_pallas_fast.py passes on the target device (round 2
    # shipped an auto-on default that failed Mosaic compile on-chip and
    # zeroed the benchmark; never auto-enable an unverified kernel).
    # None is accepted and means False.
    use_pallas_fast: Optional[bool] = None
    # Cluster-parallel map refinement cadence (parallel/cluster_ba):
    # every N keyframe insertions, one block-coordinate BA round over
    # covisibility clusters runs as a background unit (sharded across
    # `mesh` when set — each device solves its own clusters). 0 = off.
    cluster_refine_interval: int = 0


@dataclass
class TrackStats:
    n_frames: int = 0
    n_tracked: int = 0
    n_lost: int = 0
    n_keyframes: int = 0
    n_reloc: int = 0
    n_kf_grows: int = 0  # capacity doublings (keyframes)
    n_pt_grows: int = 0  # capacity doublings (map points)
    n_vo_frames: int = 0  # localization-mode visual-odometry frames (mbVO)
    n_cluster_refines: int = 0  # cluster-parallel map refinement rounds


class System:
    """End-to-end SLAM engine (reference System.cc:32-135 ctor)."""

    def __init__(self, config: SystemConfig, vocab=None, seed: int = 0):
        self.cfg = config
        cam = config.camera
        assert cam is not None, "SystemConfig.camera required"
        self.cam = cam
        use_pallas = bool(config.use_pallas_fast)
        self.extractor = ORBExtractor(
            ExtractorConfig(
                n_features=config.n_features,
                scale_factor=config.scale_factor,
                n_levels=config.n_levels,
                ini_th_fast=config.ini_th_fast,
                min_th_fast=config.min_th_fast,
                use_pallas_fast=use_pallas,
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
            vocab = build_vocabulary(train, k=k, depth=depth, levelsup_depth=max(1, depth - 2))
        self.vocab = vocab

        # Fused extraction + frame build (undistort + BoW + bipolar) as a
        # single jitted closure: one device dispatch per frame, no eager
        # ops (each eager op is a separate dispatch on-device).
        import jax as _jax

        _cam = cam
        _extract_impl = self.extractor._extract_impl

        # The vocabulary rides as a runtime ARGUMENT (registered pytree),
        # not a closure constant: the stock ~1M-word vocab's arrays would
        # otherwise be baked into every compiled program (~0.5 GB of HLO
        # constants, rejected by remote compile).
        def _frame_fn(image, voc):
            feats = _extract_impl(image)
            return build_frame(feats, _cam, voc)

        self._frame_fn = _jax.jit(_frame_fn)

        # Fused pipelined step: extraction + frame build + the whole
        # tracking state-machine body + velocity update, one dispatch.
        _sf = jnp.asarray(self.map_cfg.scale_factors, jnp.float32)
        _radius = (
            tracking.MOTION_MODEL_RADIUS_STEREO
            if config.sensor == Sensor.STEREO
            else tracking.MOTION_MODEL_RADIUS
        )

        def _pipe_fn(state, image, carry, min_obs, th_depth, vo_th_depth, voc):
            return tracking.fused_pipeline_step(
                state, image, carry, min_obs,
                _extract_impl, lambda feats: build_frame(feats, _cam, voc),
                _cam, _sf, _radius, th_depth, vo_th_depth,
            )

        self._pipe_fn = _jax.jit(_pipe_fn)
        from collections import deque

        self._pending = deque()  # (frame_id, timestamp, FrameData, FullStepResult)
        self._bg = deque()  # deferred mapping/loop work units
        self._carry = None
        # Frames dispatched before the latest keyframe insertion tracked
        # against the pre-keyframe map; their (stale) inlier counts must
        # not trigger another keyframe (see _retire_one).
        self._kf_barrier = 0
        # Post-keyframe / post-weakness hysteresis: run this many frames
        # in drained (sync-latency) mode so the refreshed map re-anchors
        # tracking before dispatches overlap again.
        self._sync_window = 0


        _scale_factors_c = tuple(self.map_cfg.scale_factors)

        def _stereo_frame_fn(left, right, voc):
            from . import stereo as stereo_mod
            from ..ops import hamming as _hamming

            lf = _extract_impl(left)
            rf = _extract_impl(right)
            frame = build_frame(lf, _cam, voc)
            ur, depth = stereo_mod.match_stereo(
                frame.uv, frame.oct, frame.bip, frame.valid,
                rf.uv, rf.octave, _hamming.bipolar(rf.desc), rf.valid,
                _cam, _scale_factors_c,
                left_img=left, right_img=right,
            )
            return frame._replace(right=ur, depth=depth)

        self._stereo_frame_fn = _jax.jit(_stereo_frame_fn)

        def _rgbd_frame_fn(image, depth_map, depth_factor, voc):
            from . import stereo as stereo_mod

            feats = _extract_impl(image)
            frame = build_frame(feats, _cam, voc)
            depth = stereo_mod.depth_from_rgbd(
                frame.uv_raw, frame.valid, depth_map, _cam, depth_factor
            )
            ur = stereo_mod.virtual_right(frame.uv, depth, _cam)
            return frame._replace(right=ur, depth=depth)

        self._rgbd_frame_fn = _jax.jit(_rgbd_frame_fn)

        self.state = mstate.empty(self.map_cfg)
        self.db = keyframe_db.empty(config.max_keyframes, config.n_features)
        mono = config.sensor == Sensor.MONOCULAR
        self.mapper = local_mapping.LocalMapper(
            self.map_cfg, cam, kf_cull_redundancy=config.kf_cull_redundancy,
            # Reference neighbor budgets (src/LocalMapping.cc:243-246,
            # 487-515): nn=20 mono / 10 otherwise for triangulation;
            # fusion extends to second-order neighbors, approximated by
            # a 2x-wider top-covisibility target set.
            n_triangulate_neighbors=20 if mono else 10,
            n_fuse_neighbors=40 if mono else 20,
        )
        self.scale_factors = jnp.asarray(self.map_cfg.scale_factors, jnp.float32)

        self.tracking_state = TrackingState.NO_IMAGES_YET
        self.velocity: Optional[np.ndarray] = None
        self.last_pose: Optional[np.ndarray] = None
        self.n_inliers_local = 0
        self.close_tracked = 0
        self.close_untracked = 0
        self.last_frame: Optional[FrameData] = None
        self.init_frame: Optional[FrameData] = None
        self.ref_kf: int = 0
        self.kf_order: List[int] = []
        self.recent_pts: List[tuple] = []  # (point_slot, kf_count_at_birth)
        self._next_kf_slot = 0
        self.frame_id: int = 0
        self.frames_since_kf: int = 0
        # Per-frame records (timestamp, Tcw_abs|None, ok, ref_slot,
        # ref_gen, Tcr|None). Tracked frames store their pose RELATIVE to
        # the reference keyframe (Tcr = Tcw @ Twc_ref at track time) so
        # loop-closure / GBA keyframe corrections propagate to the whole
        # exported trajectory at save time — the reference's
        # mlRelativeFramePoses + mlpReferences scheme
        # (src/Tracking.cc:554-576, src/System.cc:361-430). ref_slot=-1
        # means "absolute only" (init frames, relocalization frames).
        self.trajectory: List[tuple] = []
        # Slot allocation generation: keyframe slots are recycled after
        # culling, so a trajectory record is only recomposed against slot
        # poses when the slot still holds the SAME keyframe (generation
        # match); otherwise the frozen absolute pose is used (the
        # reference instead walks the spanning tree to a live parent,
        # src/System.cc:392-403 — generations are the array-native guard).
        self.kf_gen = np.zeros(config.max_keyframes, np.int64)
        # Cull repair chains: (slot, gen) -> (parent_slot, parent_gen,
        # Tcp) recorded when a keyframe is culled, so trajectory records
        # referencing it recompose through a LIVE keyframe instead of
        # freezing at the stale track-time pose (the reference's
        # parent-chain walk, src/System.cc:372-380). Without this, loop
        # corrections never reach frames whose reference was culled —
        # measured as 0.3-0.4 m pose spikes on the mono_tum eval.
        self.cull_repair = {}
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
                mesh=config.mesh,
            )
        baseline = float(np.asarray(cam.bf)) / float(np.asarray(cam.fx)) if float(np.asarray(cam.bf)) > 0 else 0.0
        self.th_depth = config.th_depth_factor * baseline

    @property
    def _vo_th_depth(self) -> float:
        """Close-depth gate for the motion model's temporal VO points:
        the reference creates them only in localization-only mode
        (UpdateLastFrame early-returns on !mbOnlyTracking,
        src/Tracking.cc:884-885), so full SLAM mode passes 0 (set empty).
        A traced float argument — toggling modes does not recompile."""
        return self.th_depth if self.localization_only else 0.0

    # ------------------------------------------------------------------
    def track_monocular(self, image: np.ndarray, timestamp: float):
        """Reference System::TrackMonocular -> Tracking::GrabImageMonocular
        (src/System.cc:257-307, src/Tracking.cc:287-323). Returns 4x4 Tcw
        (np.ndarray) or None while uninitialized/lost."""
        assert self.cfg.sensor == Sensor.MONOCULAR
        self.timer.set_frame(self.frame_id)
        if self.cfg.pipeline_lag > 0 and self.tracking_state == TrackingState.OK:
            with self.timer.stage("timesTracking.csv", "track"):
                return self._track_pipelined(image, timestamp)
        self._flush_pipeline()
        with self.timer.stage("times.csv", "orb_extract"):
            frame = self._frame_fn(image, self.vocab)  # numpy in: jit transfers async
        with self.timer.stage("timesTracking.csv", "track", sync=None):
            pose = self._track(frame, timestamp)
        self.frame_id += 1
        return pose

    # ------------------------------------------------------------------
    # Pipelined tracking: dispatch now, read back L frames later.
    def _make_carry(self):
        lf = self.last_frame
        vel = (
            self.velocity
            if self.velocity is not None
            else np.eye(4, dtype=np.float32)
        )
        return tracking.TrackCarry(
            pose=jnp.asarray(np.asarray(self.last_pose, np.float32)),
            vel=jnp.asarray(np.asarray(vel, np.float32)),
            uv=lf.uv, oct=lf.oct, ang=lf.ang, bip=lf.bip, depth=lf.depth,
            mp=lf.mp, ref_kf=jnp.int32(self.ref_kf),
        )

    def _track_pipelined(self, image, timestamp):
        """One fused dispatch per frame; the scalar readback of frame n is
        consumed at frame n+L, so the round-trip latency of the pull
        overlaps the next frames' dispatches (see SystemConfig.pipeline_lag).
        Keyframe decisions consequently run L frames late — the same skew
        the reference's asynchronous mapping thread introduces
        (src/LocalMapping.cc:67-135 processes queued keyframes while
        tracking continues)."""
        if self._carry is None:
            self._carry = self._make_carry()
        min_obs = 3 if len(self.kf_order) > 2 else 2
        frame, res, carry = self._pipe_fn(
            self.state, image, self._carry, np.int32(min_obs),
            np.float32(self.th_depth), np.float32(self._vo_th_depth),
            self.vocab,
        )
        try:
            res.host_vec.copy_to_host_async()
        except Exception:
            pass
        self.state = self.state._replace(
            mp_visible=res.mp_visible, mp_found=res.mp_found
        )
        self._carry = carry
        import time as _time

        self._pending.append(
            (self.frame_id, timestamp, frame, res, _time.perf_counter())
        )
        self.frame_id += 1
        # One unit of deferred mapping/loop work rides each frame slot
        # (the reference's LocalMapping thread interleaving).
        self._pump_background()
        out = None
        # Adaptive retirement. The configured lag is a CEILING on
        # staleness, not a fixed delay:
        #  * readbacks that have ALREADY landed are consumed immediately
        #    (non-blocking is_ready);
        #  * when tracking WEAKENS or the keyframe policy's weakness
        #    trigger (c2) is armed, the pipeline drains synchronously —
        #    a keyframe rescue that arrives L frames after inliers
        #    collapse loses the race at a map frontier (measured: 28%
        #    tracked fixed-lag vs 97% risk-aware on the yaw fixture);
        #  * pipelining exists to hide LINK latency. When the DEVICE is
        #    the bottleneck (e.g. CPU runs), overlapping buys no
        #    throughput while every decision pays L frames of blindness
        #    (measured on the 520-frame circuit at the reference policy:
        #    inliers fell 62 -> 23 inside one stale window; 66% tracked
        #    / 0 loops at lag 3 vs 97% / 1 loop sync) — configure
        #    pipeline_lag=0 there. Attempts to auto-detect the regime
        #    from inside failed: through the relay tunnel every
        #    readiness/latency probe itself costs a round trip, so the
        #    estimates were unmeasurable (three designs all collapsed
        #    the on-chip benchmark 3x); the lag is an operator decision.
        def risky():
            th_ref = self.cfg.kf_ref_ratio
            if th_ref is None:
                th_ref = 0.9 if self.cfg.sensor == Sensor.MONOCULAR else 0.75
            # Pure-cadence mode (th_ref > 1) never uses the weakness
            # trigger; clamping it to 1.0 there reduced c2_armed to
            # "inliers < ref_tracked", true on most frames — pinning the
            # pipeline to a synchronous drain and negating pipeline_lag.
            c2_armed = th_ref <= 1.0 and (
                self.n_inliers_local
                < getattr(self, "ref_tracked", 0) * th_ref
            )
            return (
                self._sync_window > 0
                or c2_armed
                or self.n_inliers_local < 2 * tracking.MIN_INLIERS_LOCAL
            )

        at_risk = risky()
        if self._sync_window > 0:
            self._sync_window -= 1
        if at_risk:
            # Fragile tracking also needs the MAPPING backlog flushed:
            # the rescue is the new keyframe's triangulated points, and
            # one-unit-per-frame pumping falls behind a dense keyframe
            # cadence.
            self._drain_background()
        while self._pending:
            if (
                not at_risk
                and len(self._pending) <= self.cfg.pipeline_lag
            ):
                try:
                    if not self._pending[0][3].host_vec.is_ready():
                        break
                except Exception:
                    break
            out = self._retire_one()
            if self.tracking_state != TrackingState.OK:
                break
            at_risk = risky()
        return out

    def _retire_one(self):
        """Consume one in-flight frame's scalar readback and run the
        host-side state machine tail for it (trajectory, keyframe policy,
        lost handling)."""
        fid, ts, frame, res, t_disp = self._pending.popleft()
        vec = np.asarray(res.host_vec)
        ok = bool(vec[0])
        self.stats.n_frames += 1
        self.ref_kf = int(vec[2])
        self.n_inliers_local = int(vec[1])
        self.ref_tracked = int(vec[3])
        self.close_tracked = int(vec[7])
        self.close_untracked = int(vec[8])
        if ok:
            pose = vec[9:25].reshape(4, 4).astype(np.float32).copy()
            if self.last_pose is not None:
                self.velocity = pose @ np.linalg.inv(self.last_pose)
            self.last_pose = pose
            self.last_frame = frame._replace(mp=res.mp)
            self.stats.n_tracked += 1
            self.frames_since_kf += 1
            self._append_traj(
                ts, pose, True, self.ref_kf, vec[25:41].reshape(4, 4)
            )
            if (
                not self.localization_only
                and fid >= self._kf_barrier
                and self._need_new_keyframe(frame)
            ):
                self._create_keyframe(frame)
                self.kf_timestamps[self.ref_kf] = ts
                # In-flight frames tracked against the pre-keyframe map;
                # their inlier counts would re-trigger c2 immediately.
                self._kf_barrier = self.frame_id
                self._sync_window = self.cfg.pipeline_lag + 1
            return pose
        if fid < self._kf_barrier:
            # SOFT MISS: this frame was dispatched against the
            # pre-keyframe map that the policy already judged exhausted —
            # its failure says nothing about the refreshed map. Skip it
            # (untracked in the trajectory) and keep the chain alive: the
            # device carry kept the last good pose with identity velocity,
            # so the next dispatch re-tracks against the new keyframe's
            # points. Declaring LOST here nuked the whole pipeline for a
            # one-frame skew artifact the synchronous path never sees.
            self._append_traj(ts, None, False)
            self.stats.n_lost += 1
            self._sync_window = max(self._sync_window, 1)
            return None
        # Failure discovered L frames late: the frames dispatched after it
        # chained on the failed pose — drain them as lost (the reference
        # likewise loses every frame between losing track and successful
        # relocalization, src/Tracking.cc:379-382). The next incoming
        # frame goes through the synchronous path and relocalizes.
        self._append_traj(ts, None, False)
        self.stats.n_lost += 1
        while self._pending:
            _, ts2, _, _, _ = self._pending.popleft()
            self._append_traj(ts2, None, False)
            self.stats.n_frames += 1
            self.stats.n_lost += 1
        self.tracking_state = TrackingState.LOST
        self.velocity = None
        self._carry = None
        if 0 < len(self.kf_order) <= 5 and not self.localization_only:
            self.reset()
        return None

    def _flush_pipeline(self):
        while self._pending:
            self._retire_one()
        self._drain_background()

    def track_stereo(self, left: np.ndarray, right: np.ndarray, timestamp: float):
        """Reference System::TrackStereo -> GrabImageStereo
        (src/System.cc:165-215, src/Tracking.cc:222-252): extract both
        views (the reference uses two CPU threads, Frame.cc:77-78; here
        both run through the same compiled extractor), associate stereo
        depth, then track."""
        assert self.cfg.sensor == Sensor.STEREO
        self.timer.set_frame(self.frame_id)
        with self.timer.stage("times.csv", "orb_extract_stereo"):
            frame = self._stereo_frame_fn(left, right, self.vocab)
        if self.tracking_state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            pose = self._depth_initialize(frame)
            self._append_traj(timestamp, pose, pose is not None)
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
                self.vocab,
            )
        if self.tracking_state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            pose = self._depth_initialize(frame)
            self._append_traj(timestamp, pose, pose is not None)
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
        st = map_ops.refresh_covis_rows(st, jnp.asarray([slot], jnp.int32))
        wu, wt = keyframe_db.compute_bow_row(frame.word, frame.idf, frame.valid)
        self.db = keyframe_db.insert(self.db, slot, wu, wt)
        self.state = st
        self.kf_order = [slot]
        self.kf_gen[slot] += 1
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
            self._append_traj(timestamp, pose, pose is not None)
            return pose

        ok = False
        pose = None
        ref_pose = None
        ref_slot_frame = -1
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
                lf.uv, lf.oct, lf.ang, lf.bip, lf.mp, lf.depth,
                np.int32(self.ref_kf), np.int32(min_obs),
                self.cam, self.scale_factors, radius,
                np.float32(self.th_depth),
                np.float32(self._vo_th_depth),
            )
            vec = np.asarray(res.host_vec)  # the frame's ONE device pull
            scal = vec[:9].astype(np.int64)
            ok = bool(scal[0])
            self.state = self.state._replace(
                mp_visible=res.mp_visible, mp_found=res.mp_found
            )
            self.ref_kf = int(scal[2])
            self.n_inliers_local = int(scal[1])
            self.ref_tracked = int(scal[3])
            self.close_tracked = int(scal[7])
            self.close_untracked = int(scal[8])
            if ok:
                pose = vec[9:25].reshape(4, 4).copy()
                # Pair the ref POSE with the ref SLOT as of this fused
                # step: _create_keyframe below moves self.ref_kf to the
                # new keyframe, which vec[25:41] does not describe.
                ref_pose = vec[25:41].reshape(4, 4).copy()
                ref_slot_frame = int(scal[2])
                self.last_frame = frame._replace(mp=res.mp)
        if self.tracking_state == TrackingState.LOST or not ok:
            ref_pose = None
            pose, ok = self._relocalize(frame)
            if ok:
                self.stats.n_reloc += 1
                pose2, ok = self._track_local_map(frame, pose)
                if ok:
                    pose = pose2
            elif (
                self.localization_only
                and self.cfg.sensor != Sensor.MONOCULAR
                and self.last_frame is not None
                and self.last_pose is not None
            ):
                # mbVO visual odometry (reference src/Tracking.cc:383-470):
                # relocalization failed but the last frame carries depth —
                # track frame-to-frame on its temporal 3D points so
                # localization-only mode survives mapless regions.
                pose, ok = self._track_visual_odometry(frame)
                if ok:
                    self.stats.n_vo_frames += 1

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

        self._append_traj(
            timestamp, pose if ok else None, bool(ok),
            ref_slot_frame if ref_pose is not None else -1, ref_pose,
        )
        # Any synchronous track invalidates the device-side recurrence;
        # the next pipelined dispatch rebases from host state.
        self._carry = None
        self._pump_background()
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

        st = map_ops.refresh_covis_rows(
            st, jnp.asarray([slot1, slot2], jnp.int32)
        )
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
        self.kf_gen[slot1] += 1
        self.kf_gen[slot2] += 1
        self._next_kf_slot = 2
        # Init points do NOT enter the probation list: the reference's
        # mlpRecentAddedMapPoints is fed only by CreateNewMapPoints
        # triangulations and tracking-inserted stereo points
        # (src/LocalMapping.cc:184,480) — CreateInitialMapMonocular
        # points are pruned by BA chi2 only. Putting them on probation
        # mass-culled every 2-obs init point two keyframes after init
        # and collapsed tracking under the reference keyframe policy.
        self.recent_pts = []
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

    def _track_visual_odometry(self, frame: FrameData):
        """Frame-to-frame VO against the last frame's depth points
        (reference mbVO, src/Tracking.cc:383-470)."""
        lf = self.last_frame
        vel = self.velocity if self.velocity is not None else np.eye(4, dtype=np.float32)
        pose_pred = (vel @ self.last_pose).astype(np.float32)
        pose, n_m, n_i = tracking.track_vo_last_frame(
            frame, lf.uv, lf.oct, lf.ang, lf.bip, lf.depth, lf.valid,
            self.last_pose.astype(np.float32), pose_pred,
            self.cam, self.scale_factors,
            tracking.MOTION_MODEL_RADIUS_STEREO,
        )
        n_m, n_i = int(n_m), int(n_i)
        if n_m >= tracking.MIN_MATCHES_MOTION and n_i >= tracking.MIN_INLIERS_TRACK:
            self.last_frame = frame._replace(
                mp=jnp.full((frame.capacity,), -1, jnp.int32)
            )
            return np.asarray(pose), True
        return None, False

    def _relocalize(self, frame: FrameData):
        """Relocalization (reference src/Tracking.cc:1427-1600): BoW
        candidates from the database, BoW matching + P3P/EPnP RANSAC."""
        from . import relocalization

        if not hasattr(self, "reloc_stage_stats"):
            self.reloc_stage_stats = {}
        pose, mp, ok = relocalization.relocalize(
            self.state, self.db, frame, self.cam, self.vocab.n_words,
            self.scale_factors, stats=self.reloc_stage_stats,
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
    # Background work queue: deferred mapping/loop units, one pumped per
    # frame — the TPU-native counterpart of the reference's LocalMapping/
    # LoopClosing threads interleaving with Tracking.
    def _pump_background(self, budget: int = 1):
        while budget > 0 and self._bg:
            self._run_bg_unit(self._bg.popleft())
            budget -= 1

    def _drain_background(self):
        while self._bg:
            self._run_bg_unit(self._bg.popleft())

    def _abort_pending_ba(self):
        """mbAbortBA (reference src/LocalMapping.cc:141 +
        src/Optimizer.cc:624-625): a new keyframe interrupts the pending
        local BA's second round; its round-1 result stands."""
        for unit in self._bg:
            if unit[0] == "lba2":
                unit[1].aborted = True

    def _run_bg_unit(self, unit):
        kind = unit[0]
        if kind == "lba2":
            self.state = self.mapper.run_ba_round2(self.state, unit[1])
        elif kind == "map_finish":
            _, pending, protected = unit
            cull_log = []
            with self.timer.stage("timesMapping.csv", "local_mapping_finish"):
                self.state, self.db = self.mapper.finish_keyframe(
                    self.state, self.db, pending, self.recent_pts,
                    self.kf_order, protected, cull_log,
                )
            self._record_culls(cull_log)
            if self.ref_kf not in self.kf_order:
                self.ref_kf = self.kf_order[-1]
        elif kind == "loop_detect":
            p = self.loop_closer.dispatch_detect(
                self.state, self.db, unit[1], self.kf_order
            )
            if p is not None:
                self._bg.append(("loop_finish", p))
        elif kind == "loop_finish":
            with self.timer.stage("timesMapping.csv", "loop_closing"):
                self.state, self.db = self.loop_closer.finish_detect(
                    self.state, self.db, unit[1], self.kf_order
                )
            if self.loop_closer.gba_requested:
                # The reference's 4th (GBA) thread, split into dispatch
                # and apply units so tracked frames interleave
                # (src/LoopClosing.cc:631,700-807).
                self.loop_closer.gba_requested = False
                self._bg.append(("gba_dispatch",))
        elif kind == "cluster_refine":
            from ..parallel.cluster_ba import cluster_block_ba

            with self.timer.stage("timesMapping.csv", "cluster_refine"):
                self.state = cluster_block_ba(
                    self.state, self.cam,
                    1.0 / jnp.asarray(self.map_cfg.level_sigma2),
                    mesh=self.cfg.mesh, rounds=1,
                    lm_iters=4, cg_iters=12,
                )
            self.stats.n_cluster_refines += 1
        elif kind == "gba_dispatch":
            with self.timer.stage("timesMapping.csv", "gba_dispatch"):
                pending = self.loop_closer.dispatch_global_ba(
                    self.state, self.kf_order, self.kf_gen,
                    self.mapper.mp_valid_host,
                )
            self._bg.append(("gba_chunk", pending))
        elif kind == "gba_chunk":
            # One LM chunk per pumped frame slot; a superseding loop
            # aborts the remainder between chunks (reference mbStopGBA,
            # src/LoopClosing.cc:455-470,716-717).
            with self.timer.stage("timesMapping.csv", "gba_chunk"):
                done = self.loop_closer.continue_global_ba(unit[1])
            self._bg.append(
                ("gba_finish", unit[1]) if done else ("gba_chunk", unit[1])
            )
        elif kind == "gba_finish":
            with self.timer.stage("timesMapping.csv", "gba_finish"):
                self.state = self.loop_closer.finish_global_ba(
                    self.state, unit[1], self.kf_order, self.kf_gen,
                    self.mapper.mp_valid_host,
                )

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame: FrameData) -> bool:
        """Reference NeedNewKeyFrame (src/Tracking.cc:1057-1145), full
        condition set: c1a (max interval), c1b (min interval AND mapper
        idle), c1c (stereo/RGBD tracking weakness or close-point
        depletion), gated by c2 (weakening vs reference KF, >15 inliers);
        when the mapper is busy the pending local BA is interrupted
        (mbAbortBA) and only stereo/RGBD insert immediately (the
        reference checks its queue <3; this engine's queue is at most one
        keyframe deep)."""
        if len(self.kf_order) == 0:
            return False
        ref_tracked = getattr(self, "ref_tracked", None)
        if ref_tracked is None:
            min_obs = 3 if len(self.kf_order) > 2 else 2
            ref_tracked = int(
                tracking.count_ref_tracked(self.state, self.ref_kf, min_obs)
            )
        inliers = self.n_inliers_local
        mono = self.cfg.sensor == Sensor.MONOCULAR
        # "Mapper idle" = no keyframe still mid-mapping (reference
        # SetAcceptKeyFrames false only WHILE ProcessNewKeyFrame..BA runs,
        # src/LocalMapping.cc:67-135). A queued-but-interruptible local-BA
        # round 2 or a loop-detection probe does NOT make the mapper busy
        # — the reference interrupts BA for insertion (mbAbortBA) and
        # loop closing is a separate thread entirely. Counting ANY queued
        # background unit as busy throttled c1b to the c1a cadence in
        # pipelined mode (6x fewer keyframes than sync on the yaw
        # fixture, which collapsed tracking).
        idle = not any(u[0] == "map_finish" for u in self._bg)

        # bNeedToInsertClose (reference :1081-1097).
        need_close = (not mono) and (
            self.close_tracked < 100 and self.close_untracked > 70
        )
        # thRefRatio (reference :1099-1105): 0.75, 0.4 for tiny maps,
        # 0.9 monocular.
        th_ref = self.cfg.kf_ref_ratio
        if th_ref is None:
            th_ref = 0.9 if mono else (0.4 if len(self.kf_order) < 2 else 0.75)

        c1a = self.frames_since_kf >= self.cfg.max_frames_between_kf
        c1b = (
            self.frames_since_kf >= self.cfg.min_frames_between_kf and idle
        )
        c1c = (not mono) and (
            inliers < ref_tracked * 0.25 or need_close
        )
        # kf_ref_ratio > 1 = pure-cadence mode (c2's weakness term always
        # passes; the interval conditions alone set the rhythm).
        #
        # Survival-floor clamp: the reference's weakness test
        # (inliers < thRefRatio*nRefMatches, src/Tracking.cc:1099-1112)
        # implicitly assumes 0.9*nRefMatches sits far above the 30-inlier
        # LOST floor (src/Tracking.cc:1048-1053). At a map frontier the
        # reference keyframe's >=3-obs count lags its fresh triangulations,
        # and when 0.9*ref_tracked < ~30 the insertion trigger becomes
        # unreachable: inliers fall through the floor before c2 can fire
        # (measured: inl 40 -> 26 in two frames skips a 2-inlier-wide
        # band). Inserting whenever inliers are within 2x of the floor
        # closes the deadband; redundant keyframes are reclaimed by
        # KeyFrameCulling, the "insert fast, cull later" policy the
        # ORB-SLAM paper states explicitly.
        weak = (
            th_ref > 1.0
            or inliers < ref_tracked * th_ref
            or inliers < 2 * tracking.MIN_INLIERS_LOCAL
        )
        c2 = (weak or need_close) and inliers > 15
        if not ((c1a or c1b or c1c) and c2):
            return False
        if idle:
            return True
        # Mapper busy: interrupt BA (reference :1120-1139). The reference's
        # mono path then DROPS the insertion because it cannot join its
        # mapping thread; this engine can — finish the queued mapping
        # units now and insert. (Dropping was measured to collapse
        # pipelined tracking on fast yaw: the rescue keyframe arrived
        # frames late, inliers fell through the floor, 28% tracked vs 98%
        # with join-and-insert.)
        self._abort_pending_ba()
        self._drain_background()
        return True

    def _grow_keyframe_capacity(self):
        """Double keyframe capacity (SURVEY §7 hard part (b)): pads every
        K-shaped map/db array; the jitted programs recompile once for the
        new shape and the cost amortizes over the next K insertions.
        Values in flight (slot indices, scalar vectors) stay valid, so the
        tracking pipeline does not need to be flushed."""
        new_K = self.state.kf_valid.shape[0] * 2
        self.state = mstate.grow_keyframes(self.state, new_K)
        self.db = keyframe_db.grow(self.db, new_K)
        self.kf_gen = np.concatenate(
            [self.kf_gen, np.zeros(new_K - len(self.kf_gen), np.int64)]
        )
        self.cfg.max_keyframes = new_K
        self.map_cfg = self.map_cfg._replace(max_keyframes=new_K)
        self.mapper.cfg = self.map_cfg
        if self.loop_closer is not None:
            self.loop_closer.cfg = self.map_cfg
        self.stats.n_kf_grows += 1

    def _grow_point_capacity(self):
        new_P = self.state.mp_valid.shape[0] * 2
        self.state = mstate.grow_points(self.state, new_P)
        self.cfg.max_points = new_P
        self.map_cfg = self.map_cfg._replace(max_points=new_P)
        self.mapper.cfg = self.map_cfg
        self.mapper.mp_valid_host = np.concatenate(
            [self.mapper.mp_valid_host,
             np.zeros(new_P - len(self.mapper.mp_valid_host), bool)]
        )
        if self.loop_closer is not None:
            self.loop_closer.cfg = self.map_cfg
        self.stats.n_pt_grows += 1

    def _ensure_point_headroom(self):
        """Grow point capacity when the mapper's next keyframe could
        exhaust the free pool (its triangulation pass hands out
        n_tri_nb*256 candidate slots)."""
        need = self.mapper.n_tri_nb * 256 + 1024
        free = int(np.sum(~self.mapper.mp_valid_host))
        if free < need:
            # The host mirror is conservative; reconcile before paying
            # for a growth.
            self.mapper.resync_point_mirror(self.state)
            free = int(np.sum(~self.mapper.mp_valid_host))
        while free < need:
            self._grow_point_capacity()
            free = int(np.sum(~self.mapper.mp_valid_host))

    def _create_keyframe(self, frame: FrameData):
        """CreateNewKeyFrame + local mapping (reference
        src/Tracking.cc:1146-1228 + LocalMapping::Run body). With
        async_mapping the mapping chain is dispatched here and its host
        tail rides the background queue; a preceding keyframe's pending
        BA round 2 is aborted first (mbAbortBA) and its remaining units
        drained — the reference equivalently processes queued keyframes
        strictly in order (src/LocalMapping.cc:153)."""
        self._abort_pending_ba()
        self._drain_background()
        frame = self.last_frame
        # kf_order is the exact set of live keyframes (mapper culls keep
        # it in sync), so slot allocation needs no device pull.
        kf_valid = np.zeros(self.cfg.max_keyframes, bool)
        kf_valid[self.kf_order] = True
        free = np.flatnonzero(~kf_valid)
        if len(free) == 0:
            self._grow_keyframe_capacity()
            kf_valid = np.zeros(self.cfg.max_keyframes, bool)
            kf_valid[self.kf_order] = True
            free = np.flatnonzero(~kf_valid)
        self._ensure_point_headroom()
        # Rotating allocation: avoid immediately recycling culled slots
        # (stale mp_first_kf/mp_ref_kf references must age out first).
        pos = np.searchsorted(free, self._next_kf_slot)
        free = np.concatenate([free[pos:], free[:pos]])
        slot = int(free[0])
        self.kf_gen[slot] += 1
        self._next_kf_slot = (slot + 1) % self.cfg.max_keyframes
        # In pipelined mode the retired frame's bindings were computed
        # against the map as of its dispatch, L frames ago; intervening
        # mapping cycles may have culled/merged those points. Stale slots
        # must not enter the observation table (local BA would constrain
        # whatever point now occupies the slot).
        mp_clean = map_ops.sanitize_bindings(self.state, frame.mp)
        self.state = mstate.insert_keyframe(
            self.state, slot, jnp.asarray(self.last_pose), self.frame_id,
            frame.uv, frame.right, frame.depth, frame.oct, frame.ang,
            frame.desc, frame.valid, frame.word, frame.node, mp_clean,
        )
        if self.cfg.sensor != Sensor.MONOCULAR:
            self._create_depth_points(slot)
        wu, wt = keyframe_db.compute_bow_row(frame.word, frame.idf, frame.valid)
        self.db = keyframe_db.insert(self.db, slot, wu, wt)
        self.kf_order.append(slot)
        self.ref_kf = slot
        self.frames_since_kf = 0
        self.stats.n_keyframes += 1
        # Periodic cluster-parallel map refinement (parallel/cluster_ba):
        # every N keyframes one block-coordinate round over covisibility
        # clusters rides the background queue — the "shard keyframe
        # blocks by covisibility clusters" scaling axis (SURVEY §7 step
        # 8) as ongoing maintenance, sharded over cfg.mesh when set.
        if (
            self.cfg.cluster_refine_interval > 0
            and self.stats.n_keyframes % self.cfg.cluster_refine_interval == 0
            and len(self.kf_order) >= 8
        ):
            self._bg.append(("cluster_refine",))

        protected = (
            {k for e in self.loop_closer.loop_edges for k in e}
            if self.loop_closer is not None
            else set()
        )
        if self.cfg.async_mapping:
            # Dispatch-only: device work queues behind tracking; the host
            # tail rides the background queue, one unit per frame.
            with self.timer.stage("timesMapping.csv", "local_mapping"):
                self.state, pending = self.mapper.dispatch_keyframe(
                    self.state, slot, self.recent_pts, self.kf_order
                )
            self._bg.append(("lba2", pending))
            self._bg.append(("map_finish", pending, protected))
            if self.loop_closer is not None and len(self.kf_order) > 3:
                self._bg.append(("loop_detect", slot))
            return
        cull_log = []
        with self.timer.stage("timesMapping.csv", "local_mapping"):
            self.state, self.db = self.mapper.process_keyframe(
                self.state, self.db, slot, self.recent_pts, self.kf_order,
                protected=protected, cull_log=cull_log,
            )
        self._record_culls(cull_log)
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
    def _append_traj(self, ts, pose, ok, ref_slot=-1, ref_pose=None):
        """Record one frame for trajectory export. With a reference
        keyframe pose, store the frame relative to it (Tcr) so later map
        corrections re-pose the frame at export time."""
        Tcr = None
        gen = -1
        if ok and ref_slot >= 0 and ref_pose is not None:
            Tcr = np.asarray(pose, np.float64) @ np.linalg.inv(
                np.asarray(ref_pose, np.float64)
            )
            gen = int(self.kf_gen[ref_slot])
        self.trajectory.append(
            (ts, pose.copy() if pose is not None else None, bool(ok),
             int(ref_slot) if Tcr is not None else -1, gen, Tcr)
        )

    def _record_culls(self, cull_log):
        """Store cull-time relative poses keyed by (slot, generation);
        see self.cull_repair."""
        for nb, parent, Tcp in cull_log:
            self.cull_repair[(int(nb), int(self.kf_gen[nb]))] = (
                int(parent), int(self.kf_gen[parent]), Tcp,
            )

    def get_trajectory(self):
        """[(timestamp, Tcw or None, ok)] for export (reference
        SaveTrajectoryTUM/KITTI source data, src/System.cc:361-511).
        Frames recorded relative to a reference keyframe are recomposed
        against that keyframe's CURRENT pose — walking cull-repair chains
        to a live keyframe when the reference was culled — so
        loop-closure and global-BA corrections retroactively fix the
        whole trajectory (reference src/System.cc:372-430)."""
        self._flush_pipeline()
        kf_pose = np.asarray(self.state.kf_pose, np.float64)
        live = set(self.kf_order)
        out = []
        for ts, pose, ok, ref_slot, ref_gen, Tcr in self.trajectory:
            if ok and ref_slot >= 0 and Tcr is not None:
                # Walk culled references to a survivor (bounded).
                T = Tcr
                slot, gen = ref_slot, ref_gen
                for _ in range(64):
                    if slot in live and slot < len(self.kf_gen) and \
                            int(self.kf_gen[slot]) == gen:
                        pose = (T @ kf_pose[slot]).astype(np.float32)
                        break
                    rep = self.cull_repair.get((slot, gen))
                    if rep is None:
                        break  # chain dead-ends: keep track-time pose
                    parent, parent_gen, Tcp = rep
                    T = T @ Tcp
                    slot, gen = parent, parent_gen
            out.append((ts, pose, ok))
        return out

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
        self._flush_pipeline()
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
        self._flush_pipeline()
        self.localization_only = enabled

    def reset(self):
        """Full system reset (reference System::Reset -> Tracking::Reset,
        src/Tracking.cc:1602-1638: clear map, database, state machine)."""
        self._pending.clear()  # in-flight frames reference the dying map
        self._bg.clear()
        self._carry = None
        self._kf_barrier = 0
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
            self.loop_closer.last_loop_kf_seen = -(10**9)
            self.loop_closer.loop_edges = []
            self.loop_closer.gba_idx += 1  # supersede any in-flight GBA
            self.loop_closer.gba_requested = False

    def save_trajectory_tum(self, path: str):
        from ..io import trajectory as traj_io

        traj_io.save_trajectory_tum(self.get_trajectory(), path)

    def save_trajectory_kitti(self, path: str):
        from ..io import trajectory as traj_io

        traj_io.save_trajectory_kitti(self.get_trajectory(), path)

    def save_keyframe_trajectory_tum(self, path: str):
        from ..io import trajectory as traj_io

        self._flush_pipeline()
        traj_io.save_keyframe_trajectory_tum(
            self.state, self.kf_order, self.kf_timestamps, path
        )

    def save_map(self, path: str):
        from ..io import checkpoint

        self._flush_pipeline()
        checkpoint.save_system(self, path)

    def load_map(self, path: str, localization_only: bool = True):
        from ..io import checkpoint

        checkpoint.load_into_system(self, path, localization_only)
