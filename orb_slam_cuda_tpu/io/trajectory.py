"""Trajectory export in TUM and KITTI formats.

Replaces `System::SaveTrajectoryTUM/SaveTrajectoryKITTI/
SaveKeyFrameTrajectoryTUM` (reference: src/System.cc:361-511): TUM rows
are `timestamp tx ty tz qx qy qz qw` of the camera-to-world transform;
KITTI rows are the 3x4 camera-to-world matrix row-major. Untracked frames
are skipped (the reference writes only frames with poses).
"""

from __future__ import annotations

import numpy as np


def _twc(Tcw: np.ndarray) -> np.ndarray:
    return np.linalg.inv(Tcw)


def _quat_wxyz(R: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from ..geometry import se3

    return np.asarray(se3.rot_to_quat(jnp.asarray(R[None].astype(np.float32))))[0]


def save_trajectory_tum(trajectory, path: str):
    """trajectory: [(timestamp, Tcw 4x4 or None, ok)]."""
    with open(path, "w") as f:
        for t, Tcw, ok in trajectory:
            if not ok or Tcw is None:
                continue
            Twc = _twc(np.asarray(Tcw, np.float64))
            q = _quat_wxyz(Twc[:3, :3])
            tx, ty, tz = Twc[:3, 3]
            f.write(
                f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def save_trajectory_kitti(trajectory, path: str):
    with open(path, "w") as f:
        for t, Tcw, ok in trajectory:
            if not ok or Tcw is None:
                continue
            Twc = _twc(np.asarray(Tcw, np.float64))
            row = Twc[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def save_keyframe_trajectory_tum(state, kf_order, timestamps, path: str):
    """Keyframe-only trajectory (reference SaveKeyFrameTrajectoryTUM,
    src/System.cc:455-483). `timestamps`: dict slot->timestamp."""
    import numpy as np

    with open(path, "w") as f:
        for slot in kf_order:
            Tcw = np.asarray(state.kf_pose[slot], np.float64)
            Twc = _twc(Tcw)
            q = _quat_wxyz(Twc[:3, :3])
            tx, ty, tz = Twc[:3, 3]
            t = timestamps.get(slot, 0.0)
            f.write(
                f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def load_trajectory_tum(path: str):
    """Inverse of save_trajectory_tum -> [(t, Tcw)] (for tests/tools)."""
    import jax.numpy as jnp

    from ..geometry import se3

    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 8:
                continue
            t = float(parts[0])
            tx, ty, tz, qx, qy, qz, qw = [float(x) for x in parts[1:]]
            R = np.asarray(
                se3.quat_to_rot(jnp.asarray([qw, qx, qy, qz], jnp.float32))
            )
            Twc = np.eye(4)
            Twc[:3, :3] = R
            Twc[:3, 3] = [tx, ty, tz]
            out.append((t, np.linalg.inv(Twc)))
    return out
