"""Map checkpoint / resume.

Replaces the fork's YAML map persistence (reference: `Map::saveMap`
src/Map.cc:133-181, `KeyFrame::write` src/KeyFrame.cc:674-860,
`MapPoint::write` src/MapPoint.cc:424-491, `KeyFrameDatabase::write`
src/KeyFrameDatabase.cc:58-75, and the two-pass id->pointer fixup on load
src/Map.cc:183-270). Because the map here is already a flat array PyTree,
the entire save/load is one npz round-trip — no pointer fixup exists to
do (`updateLinks` is vacuously true), and the BoW database rows are part
of the same file.

On startup, the reference auto-loads `map.yml` and enters
localization-only mode (src/System.cc:82-99); `System`'s counterpart is
`load_into_system` + `set_localization_mode(True)`.
"""

from __future__ import annotations

import numpy as np

from ..slam_map import keyframe_db as kdb
from ..slam_map.state import MapState

FORMAT_VERSION = 1


def save_map(state: MapState, db, kf_order, path: str, extra: dict = None):
    """Serialize map PyTree + BoW rows + keyframe order to one .npz."""
    arrays = {f"map_{k}": np.asarray(v) for k, v in state._asdict().items()}
    arrays.update({f"db_{k}": np.asarray(v) for k, v in db._asdict().items()})
    arrays["kf_order"] = np.asarray(kf_order, np.int64)
    arrays["format_version"] = np.asarray(FORMAT_VERSION)
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_map(path: str):
    """-> (MapState, BowDB, kf_order list, extras dict)."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    ver = int(data["format_version"])
    if ver != FORMAT_VERSION:
        raise ValueError(f"checkpoint format {ver} != {FORMAT_VERSION}")
    map_kwargs = {
        k[len("map_"):]: jnp.asarray(data[k])
        for k in data.files
        if k.startswith("map_")
    }
    db_kwargs = {
        k[len("db_"):]: jnp.asarray(data[k])
        for k in data.files
        if k.startswith("db_")
    }
    extras = {
        k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")
    }
    if "covis" not in map_kwargs:
        K = map_kwargs["kf_valid"].shape[0]
        map_kwargs["covis"] = jnp.zeros((K, K), jnp.int32)
    state = MapState(**map_kwargs)
    # Rebuild the incremental covisibility from the observation table:
    # the persisted copy may be stale relative to culls/fusions that
    # happened after the last refresh (and pre-covis checkpoints lack it
    # entirely). One full recompute at load time is the 2-pass pointer
    # fixup of the reference's loadMap (src/Map.cc:183-270) in spirit.
    from ..slam_map import ops as _map_ops

    state = state._replace(covis=_map_ops.covisibility_matrix(state))
    db = kdb.BowDB(**db_kwargs)
    kf_order = [int(x) for x in data["kf_order"]]
    return state, db, kf_order, extras


def save_system(system, path: str):
    """Save a live System's map (reference System dtor save calls,
    src/System.cc:139-146 — commented out there, first-class here).

    Beyond the map/db arrays, this persists the engine bookkeeping the
    reference serializes through its KeyFrame records (mTimeStamp,
    KeyFrame.cc:692) plus the mapper's probation list and allocator
    cursors, so a load can CONTINUE MAPPING, not just localize."""
    ts_slots = np.asarray(sorted(system.kf_timestamps), np.int64)
    ts_vals = np.asarray(
        [system.kf_timestamps[int(s)] for s in ts_slots], np.float64
    )
    recent = np.asarray(system.recent_pts or np.zeros((0, 2)), np.int64)
    loop_edges = np.asarray(
        (system.loop_closer.loop_edges if system.loop_closer else [])
        or np.zeros((0, 2)),
        np.int64,
    )
    save_map(
        system.state, system.db, system.kf_order, path,
        extra={
            "frame_id": system.frame_id,
            "kf_ts_slots": ts_slots,
            "kf_ts_vals": ts_vals,
            "recent_pts": recent,
            "loop_edges": loop_edges,
            "next_kf_slot": system._next_kf_slot,
            "next_pt_slot": system.mapper._next_pt_slot,
        },
    )


def load_into_system(system, path: str, localization_only: bool = True):
    """Load a checkpoint into a System and (by default) enter
    localization-only mode, mirroring the reference startup auto-load
    (src/System.cc:82-99: state LOST -> relocalize against the map).
    With localization_only=False the full mapping bookkeeping is restored
    and the system resumes building the same map after relocalizing."""
    state, db, kf_order, extras = load_map(path)
    # Capacities follow the checkpoint (it may have been grown).
    K, N = state.kf_mp.shape
    P = state.mp_xyz.shape[0]
    if N != system.map_cfg.max_features:
        raise ValueError(
            f"checkpoint feature capacity {N} != extractor's "
            f"{system.map_cfg.max_features}; construct the System with "
            "matching n_features"
        )
    system.cfg.max_keyframes = K
    system.cfg.max_points = P
    system.map_cfg = system.map_cfg._replace(max_keyframes=K, max_points=P)
    system.mapper.cfg = system.map_cfg
    if system.loop_closer is not None:
        system.loop_closer.cfg = system.map_cfg
    system.state = state
    system.db = db
    system.kf_order = kf_order
    system.mapper.mp_valid_host = np.zeros(P, bool)
    system.mapper.resync_point_mirror(state)
    system.frame_id = int(extras.get("frame_id", 0)) + 1
    ts_slots = extras.get("kf_ts_slots")
    if ts_slots is not None:
        system.kf_timestamps = {
            int(s): float(v)
            for s, v in zip(ts_slots, extras["kf_ts_vals"])
        }
    system.recent_pts = [
        (int(p), int(b)) for p, b in extras.get("recent_pts", [])
    ]
    if system.loop_closer is not None:
        system.loop_closer.loop_edges = [
            (int(a), int(b)) for a, b in extras.get("loop_edges", [])
        ]
    system._next_kf_slot = int(extras.get("next_kf_slot", 0))
    system.mapper._next_pt_slot = int(extras.get("next_pt_slot", 0))
    system.stats.n_keyframes = len(kf_order)
    system.ref_kf = kf_order[-1] if kf_order else 0
    from .. import engine

    system.tracking_state = engine.system.TrackingState.LOST
    system.last_pose = None
    system.velocity = None
    system.set_localization_mode(localization_only)
    return system
