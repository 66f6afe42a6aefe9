"""Headless map/frame visualization.

Replaces the reference's Pangolin/OpenCV viewer stack (reference:
src/Viewer.cc:54-170 Run loop, src/FrameDrawer.cc:38-203 per-frame
overlay, src/MapDrawer.cc:44-233 DrawMapPoints/DrawKeyFrames/
DrawCurrentCamera) with server-side renderings written to PNG — the
appropriate form for a headless TPU deployment: the same information
(map points, keyframe frusta + covisibility edges, current camera,
tracked-feature overlay), produced on demand instead of a GUI thread.
"""

from __future__ import annotations

import numpy as np


def _twc_centers(kf_pose, kf_valid):
    centers = []
    for k in np.flatnonzero(kf_valid):
        T = kf_pose[k]
        centers.append((-T[:3, :3].T @ T[:3, 3], k))
    return centers


def draw_map_topview(state, path: str, covis=None, current_pose=None):
    """Top-down (x,z) map render: points, keyframes, covisibility edges,
    current camera (MapDrawer equivalents)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kf_pose = np.asarray(state.kf_pose)
    kf_valid = np.asarray(state.kf_valid)
    xyz = np.asarray(state.mp_xyz)[np.asarray(state.mp_valid)]

    fig, ax = plt.subplots(figsize=(8, 8))
    if len(xyz):
        ax.scatter(xyz[:, 0], xyz[:, 2], s=1, c="k", alpha=0.4, label="map points")
    centers = _twc_centers(kf_pose, kf_valid)
    if centers:
        cs = np.stack([c for c, _ in centers])
        ax.scatter(cs[:, 0], cs[:, 2], s=25, c="tab:blue", marker="s",
                   label="keyframes")
        if covis is not None:
            covis = np.asarray(covis)
            for ci, ki in centers:
                for cj, kj in centers:
                    if kj > ki and covis[ki, kj] >= 100:
                        ax.plot([ci[0], cj[0]], [ci[2], cj[2]],
                                c="tab:green", lw=0.5, alpha=0.6)
    if current_pose is not None:
        T = np.asarray(current_pose)
        c = -T[:3, :3].T @ T[:3, 3]
        ax.scatter([c[0]], [c[2]], s=80, c="tab:red", marker="^",
                   label="camera")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    if path is None:
        import io as _io

        buf = _io.BytesIO()
        fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
        plt.close(fig)
        return buf.getvalue()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def render_map_png(state, covis=None, current_pose=None) -> bytes:
    """In-memory top-view render — the live-viewer frame served over
    HTTP (io/serve.py GET /map.png)."""
    return draw_map_topview(state, None, covis=covis,
                            current_pose=current_pose)


def draw_frame(image, frame, path: str):
    """Tracked-feature overlay (FrameDrawer::DrawFrame equivalent):
    green = feature bound to a map point, blue = unbound detection."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    uv = np.asarray(frame.uv_raw)
    valid = np.asarray(frame.valid)
    bound = np.asarray(frame.mp) >= 0

    fig, ax = plt.subplots(figsize=(10, 10 * image.shape[0] / image.shape[1]))
    ax.imshow(image, cmap="gray")
    free = valid & ~bound
    ax.scatter(uv[free, 0], uv[free, 1], s=6, facecolors="none",
               edgecolors="tab:blue", linewidths=0.6)
    trk = valid & bound
    ax.scatter(uv[trk, 0], uv[trk, 1], s=8, facecolors="none",
               edgecolors="tab:green", linewidths=0.9)
    ax.set_axis_off()
    ax.set_title(f"tracked {int(trk.sum())} / detected {int(valid.sum())}")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
