"""Settings loading: OpenCV-YAML-compatible camera/ORB configuration.

Reads the reference's per-dataset settings files unchanged (reference:
Examples/Monocular/KITTI00-02.yaml:1-56, TUM1.yaml, EuRoC.yaml, parsed in
src/Tracking.cc:52-156): Camera.fx/fy/cx/cy/k1..k3/p1/p2/bf/fps/RGB,
ORBextractor.{nFeatures,scaleFactor,nLevels,iniThFAST,minThFAST},
ThDepth, DepthMapFactor, and the fork-added required Camera.width/height
(the compiled extraction graph is shape-static for the same reason the
fork's VX graph was, src/Tracking.cc:124-127).
"""

from __future__ import annotations


from ..engine.system import Sensor, SystemConfig
from ..geometry.camera import Camera


class SettingsError(ValueError):
    pass


def _parse_opencv_yaml(path: str) -> dict:
    """Parse OpenCV FileStorage YAML (%YAML:1.0 header, `key: value` with
    dotted keys). PyYAML rejects the %YAML:1.0 directive, so strip it."""
    import yaml

    with open(path) as f:
        text = f.read()
    lines = [
        ln for ln in text.splitlines()
        if not ln.startswith("%YAML") and not ln.startswith("---")
    ]
    return yaml.safe_load("\n".join(lines)) or {}


def load_settings(path: str, sensor: Sensor = Sensor.MONOCULAR,
                  **overrides) -> SystemConfig:
    """Settings YAML -> SystemConfig (reference Tracking ctor parse)."""
    d = _parse_opencv_yaml(path)

    def get(key, default=None, required=False):
        if key in d:
            return d[key]
        if required:
            raise SettingsError(f"missing required setting {key!r} in {path}")
        return default

    width = get("Camera.width", required=True)
    height = get("Camera.height", required=True)
    cam = Camera.create(
        fx=get("Camera.fx", required=True),
        fy=get("Camera.fy", required=True),
        cx=get("Camera.cx", required=True),
        cy=get("Camera.cy", required=True),
        k1=get("Camera.k1", 0.0),
        k2=get("Camera.k2", 0.0),
        p1=get("Camera.p1", 0.0),
        p2=get("Camera.p2", 0.0),
        k3=get("Camera.k3", 0.0),
        bf=get("Camera.bf", 0.0),
        width=int(width),
        height=int(height),
    )
    fps = get("Camera.fps", 30.0) or 30.0
    cfg = SystemConfig(
        camera=cam,
        sensor=sensor,
        n_features=int(get("ORBextractor.nFeatures", 1000)),
        scale_factor=float(get("ORBextractor.scaleFactor", 1.2)),
        n_levels=int(get("ORBextractor.nLevels", 8)),
        ini_th_fast=float(get("ORBextractor.iniThFAST", 20)),
        min_th_fast=float(get("ORBextractor.minThFAST", 7)),
        max_frames_between_kf=int(fps),
        th_depth_factor=float(get("ThDepth", 35.0)),
        depth_map_factor=(
            1.0 / float(get("DepthMapFactor", 1.0))
            if float(get("DepthMapFactor", 1.0)) != 0
            else 1.0
        ),
    )
    # Engine overrides from the settings file: any `SLAM.<field>` key maps
    # onto the SystemConfig field of that name (the reference exposes its
    # engine knobs through the same per-dataset YAML, src/Tracking.cc:
    # 52-156; this is the equivalent for the knobs SystemConfig adds).
    from dataclasses import fields as _fields

    # Coercion dispatches on the DECLARED field type (stringified under
    # `from __future__ import annotations`), not the current value's
    # runtime type: a None default (kf_ref_ratio) or a future
    # Optional[int] field must not silently coerce to float, and fields
    # whose type is not YAML-settable (camera, sensor, mesh) are
    # rejected explicitly rather than setattr'd raw.
    for f in _fields(SystemConfig):
        key = "SLAM." + f.name
        if key not in d:
            continue
        v = d[key]
        ftype = str(f.type).replace("typing.", "")
        if ftype in ("bool", "Optional[bool]"):
            v = bool(int(v))
        elif ftype in ("int", "Optional[int]"):
            v = int(v)
        elif ftype in ("float", "Optional[float]"):
            v = float(v)
        else:
            raise ValueError(
                f"{key}: SystemConfig field of type {ftype!r} cannot be "
                "set from a YAML settings file"
            )
        setattr(cfg, f.name, v)
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg
