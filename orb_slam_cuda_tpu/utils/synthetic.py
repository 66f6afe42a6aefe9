"""Synthetic textured scenes with exact ground-truth poses.

Test/bench-side rendering (numpy + cv2 — NOT part of the TPU compute
path). The reference has no unit tests at all and validates only on
KITTI/TUM datasets (SURVEY.md §4); since CI here has no datasets, these
scenes serve as the golden fixtures: textured planes rendered by
homography warp give trackable frames with exact ground truth for
ATE-gated end-to-end tests.
"""

from __future__ import annotations

import numpy as np


def make_texture(h: int, w: int, rng, n_blobs: int | None = None) -> np.ndarray:
    """Corner-rich random texture: random rectangles over noise, lightly
    blurred so FAST/BRIEF behave like on natural images. Blob count
    scales with area (constant corner density; 400 at 768x768)."""
    import cv2

    if n_blobs is None:
        n_blobs = max(400, (h * w) // 1475)
    tex = rng.uniform(64, 192, size=(h, w)).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), 3.0)
    for _ in range(n_blobs):
        x, y = rng.integers(0, w - 12), rng.integers(0, h - 12)
        bw, bh = rng.integers(4, 24), rng.integers(4, 24)
        val = rng.uniform(0, 255)
        cv2.rectangle(tex, (int(x), int(y)), (int(x + bw), int(y + bh)), float(val), -1)
    tex = cv2.GaussianBlur(tex, (3, 3), 0.8)
    return np.clip(tex, 0, 255).astype(np.uint8)


class Plane:
    """A textured world plane: X(u,v) = origin + u*eu + v*ev, with texture
    pixel (col,row) mapping to (u,v) = (col*scale, row*scale) meters."""

    def __init__(self, origin, eu, ev, tex, scale):
        self.origin = np.asarray(origin, np.float64)
        self.eu = np.asarray(eu, np.float64)
        self.ev = np.asarray(ev, np.float64)
        self.tex = tex
        self.scale = float(scale)

    def sample_points(self, rng, n):
        """Random 3D points on the plane (for direct geometric fixtures)."""
        th, tw = self.tex.shape
        us = rng.uniform(0, tw * self.scale, n)
        vs = rng.uniform(0, th * self.scale, n)
        return self.origin[None] + us[:, None] * self.eu[None] + vs[:, None] * self.ev[None]


class PlanarScene:
    """One or more textured planes; renders pinhole views at given poses."""

    def __init__(self, planes):
        self.planes = planes

    @staticmethod
    def default(rng, depth: float = 5.0, second_depth: float = 8.0,
                extent: float = 12.0, tex_size: int = 1024):
        """Two fronto-parallel planes at different depths (parallax-rich).

        The world frame: x right, y down, z forward (camera at origin
        looking +z sees both planes)."""
        tex1 = make_texture(tex_size, tex_size, rng)
        tex2 = make_texture(tex_size, tex_size, rng)
        scale1 = extent / tex_size
        scale2 = 2 * extent / tex_size
        p_near = Plane(
            origin=[-extent / 2, -extent / 2, depth],
            eu=[1.0, 0, 0], ev=[0, 1.0, 0], tex=tex1, scale=scale1,
        )
        p_far = Plane(
            origin=[-extent, -extent, second_depth],
            eu=[1.0, 0, 0], ev=[0, 1.0, 0], tex=tex2, scale=scale2,
        )
        return PlanarScene([p_far, p_near])

    def render(self, K, Tcw, width: int, height: int,
               return_depth: bool = False):
        """Render grayscale uint8 (height,width) from world->cam pose Tcw.

        Each plane's texture->image map is the homography
        H = K [R eu, R ev, R origin + t] diag(scale, scale, 1).
        Per-pixel ray-plane depths provide z-ordering and clip plane parts
        behind the camera (needed for in-room scenes where side walls
        extend past the camera)."""
        import cv2

        K = np.asarray(K, np.float64)
        Tcw = np.asarray(Tcw, np.float64)
        R, t = Tcw[:3, :3], Tcw[:3, 3]
        out = np.zeros((height, width), np.uint8)
        depth = np.full((height, width), np.inf)

        # Back-projected pixel rays (camera frame).
        us, vs = np.meshgrid(np.arange(width), np.arange(height))
        Kinv = np.linalg.inv(K)
        rays = np.stack([us, vs, np.ones_like(us)], axis=-1) @ Kinv.T  # (H,W,3)

        for plane in self.planes:
            eu_c = R @ plane.eu
            ev_c = R @ plane.ev
            p0_c = R @ plane.origin + t
            n = np.cross(eu_c, ev_c)
            nn = np.linalg.norm(n)
            if nn < 1e-12:
                continue
            n = n / nn
            denom = rays @ n  # (H,W)
            num = n @ p0_c
            with np.errstate(divide="ignore", invalid="ignore"):
                lam = num / denom  # ray-plane depth multiplier
            lam = np.where(np.abs(denom) < 1e-9, np.inf, lam)

            cols = np.stack(
                [eu_c * plane.scale, ev_c * plane.scale, p0_c], axis=1
            )
            H = K @ cols
            if abs(np.linalg.det(H)) < 1e-12:
                continue
            warped = cv2.warpPerspective(
                plane.tex, H, (width, height),
                flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT, borderValue=0,
            )
            mask = cv2.warpPerspective(
                np.full(plane.tex.shape, 255, np.uint8), H, (width, height),
                flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT, borderValue=0,
            )
            visible = (mask > 0) & (lam > 0.05) & (lam < depth)
            out = np.where(visible, warped, out)
            depth = np.where(visible, lam, depth)
        if return_depth:
            # lam scales rays (x,y,1): it IS the z-depth in meters.
            return out, np.where(np.isfinite(depth), depth, 0.0).astype(np.float32)
        return out

    def render_with_depth(self, K, Tcw, width: int, height: int):
        """(gray uint8, z-depth float32 meters, 0 = no surface) — the
        RGBD-dataset generator's ground-truth depth channel."""
        return self.render(K, Tcw, width, height, return_depth=True)

    def render_stereo(self, K, Tcw, baseline: float, width: int, height: int):
        """Left/right pair; right camera displaced +baseline along cam x."""
        T_rl = np.eye(4)
        T_rl[0, 3] = -baseline  # right cam sees points shifted -x
        left = self.render(K, Tcw, width, height)
        right = self.render(K, T_rl @ Tcw, width, height)
        return left, right


def room_scene(rng, half_size: float = 8.0, tex_size: int = 1024,
               n_walls: int = 4):
    """A regular-polygon room of textured walls (camera inside). The
    classic loop-closure scenario: yaw around the room sees each wall in
    turn and returns to the start view. `half_size` is the apothem (wall
    distance from the center); n_walls=4 is the original square room,
    higher counts give shallower corners (easier continuous tracking
    through the turn, like a real loop trajectory's gentle curvature)."""
    L = half_size
    half_w = L * np.tan(np.pi / n_walls)  # half wall width
    scale = 2 * L / tex_size  # meters per texel (walls are 2L tall)
    tex_w = max(64, int(round(tex_size * half_w / L)))
    ev = np.array([0.0, 1.0, 0.0])  # y down
    walls = []
    for k in range(n_walls):
        phi = 2 * np.pi * k / n_walls
        d = np.array([np.sin(phi), 0.0, np.cos(phi)])  # outward normal
        eu = np.array([np.cos(phi), 0.0, -np.sin(phi)])  # wall tangent
        origin = L * d - half_w * eu - L * ev
        tex = make_texture(tex_size, tex_w, rng)
        walls.append(Plane(origin, eu, ev, tex, scale))
    return PlanarScene(walls)


def ring_obstacles(rng, n: int, ring_radius: float, height: float = 4.0,
                   width: float = 6.0, tex_size: int = 256,
                   yaw_jitter: float = 0.4):
    """Billboard planes on a ring — roadside-structure stand-ins for
    forward-motion fixtures. Real KITTI features live ~2-4 s (roadside
    objects sweep through the view); a bare-walls room gives features
    unbounded lifetime, which starves the reference keyframe policy's
    weakness trigger c2 (inliers never decay below thRefRatio x
    nRefMatches, reference src/Tracking.cc:1099-1112) and freezes
    nRefMatches (new triangulations can never reach minObs=3 without new
    keyframes). Occluders restore the turnover the policy was designed
    around, and their close range anchors monocular scale the way KITTI
    roadside parallax does."""
    planes = []
    for k in range(n):
        phi = 2 * np.pi * (k + rng.uniform(-0.3, 0.3)) / n
        r = ring_radius * rng.uniform(0.92, 1.08)
        center = np.array([r * np.sin(phi), 0.0, -r * np.cos(phi)])
        yaw = phi + rng.uniform(-yaw_jitter, yaw_jitter)
        eu = np.array([np.cos(yaw), 0.0, -np.sin(yaw)])
        ev = np.array([0.0, 1.0, 0.0])
        w = width * rng.uniform(0.7, 1.4)
        h = height * rng.uniform(0.7, 1.3)
        scale = h / tex_size
        tex_w = max(32, int(round(w / scale)))
        origin = center - (w / 2) * eu - (h / 2) * ev
        tex = make_texture(tex_size, tex_w, rng)
        planes.append(Plane(origin, eu, ev, tex, scale))
    return planes


def loop_trajectory(n_frames: int, radius: float = 1.5, overshoot: float = 0.15):
    """Full in-place yaw loop: the camera walks a small circle while
    yawing 360*(1+overshoot) degrees, revisiting its starting view with
    accumulated-drift opportunity — the loop-closure fixture."""
    from ..geometry import se3
    import jax.numpy as jnp

    poses = []
    total = 2 * np.pi * (1.0 + overshoot)
    for i in range(n_frames):
        th = total * i / max(n_frames - 1, 1)
        # Camera center on a circle, looking outward (yaw th about y).
        c = np.array([radius * np.sin(th), 0.0, -radius * np.cos(th) + radius])
        Rwc = np.array(se3.so3_exp(jnp.asarray(np.array([0.0, th, 0.0], np.float32))))
        Rcw = Rwc.T
        T = np.eye(4)
        T[:3, :3] = Rcw
        T[:3, 3] = -Rcw @ c
        poses.append(T)
    return poses


def circuit_trajectory(n_frames: int, radius: float = 5.0, laps: float = 1.15,
                       start: float = 0.0):
    """KITTI-style circuit: the camera rides a circle of `radius` around
    the room center looking FORWARD along the tangent, for `laps` laps
    (world->cam poses Tcw).

    Unlike `loop_trajectory` (in-place yaw, where every lap-2 view stays
    covisibility-connected to lap-1 and re-entry latches seamlessly), a
    circuit leaves each wall section behind and genuinely revisits the
    start region after a full lap with accumulated mono scale/yaw drift —
    the operating point where the reference's DetectLoop actually fires
    (reference src/LoopClosing.cc:122-265; its eval datasets are
    circuits for the same reason)."""
    from ..geometry import se3
    import jax.numpy as jnp

    poses = []
    total = 2 * np.pi * laps
    for i in range(n_frames):
        th = 2 * np.pi * start + total * i / max(n_frames - 1, 1)
        c = np.array([radius * np.sin(th), 0.0, -radius * np.cos(th)])
        yaw = th + np.pi / 2  # look along the tangent (direction of travel)
        Rwc = np.array(se3.so3_exp(jnp.asarray(np.array([0.0, yaw, 0.0], np.float32))))
        Rcw = Rwc.T
        T = np.eye(4)
        T[:3, :3] = Rcw
        T[:3, 3] = -Rcw @ c
        poses.append(T)
    return poses


def orbit_trajectory(n_frames: int, radius: float = 0.4, depth_amp: float = 0.15,
                     yaw_amp: float = 0.05):
    """Smooth sideways-arc camera trajectory (world->cam poses Tcw).

    Lateral translation with mild depth and yaw variation — enough parallax
    for mono initialization, overlap maintained for tracking."""
    from ..geometry import se3
    import jax.numpy as jnp

    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        tx = radius * np.sin(2 * np.pi * s)
        ty = 0.08 * np.sin(4 * np.pi * s)
        tz = depth_amp * np.sin(2 * np.pi * s + 1.0)
        yaw = yaw_amp * np.sin(2 * np.pi * s)
        xi = jnp.asarray(np.array([tx, ty, tz, 0.0, yaw, 0.0], np.float32))
        poses.append(np.asarray(se3.exp(xi), np.float64))
    return poses
