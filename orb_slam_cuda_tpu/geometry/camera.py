"""Pinhole camera with radial-tangential distortion.

Replaces the reference's scattered OpenCV camera handling: settings parse
(reference: src/Tracking.cc:52-156), `Frame::UndistortKeyPoints`
(src/Frame.cc:401+, cv::undistortPoints) and the projection math inlined
throughout `ORBmatcher`/`Optimizer`.

All functions are jit/vmap friendly; intrinsics travel as a small
`Camera` NamedTuple of scalars so a jitted function specializes on shapes
only, not values.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Intrinsics + distortion. `bf` is stereo baseline × fx (reference
    `Camera.bf`, src/Tracking.cc:100-116); 0 for monocular."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    bf: jnp.ndarray
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, bf=0.0,
               width=640, height=480):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return Camera(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2),
                      f(k3), f(bf), int(width), int(height))

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            jnp.float32,
        )

    @property
    def has_distortion(self):
        # Static check usable at trace time (intrinsics are concrete).
        return bool(jnp.any(jnp.array([self.k1, self.k2, self.p1, self.p2, self.k3]) != 0.0))


def distort_normalized(cam: Camera, xy):
    """Apply radial-tangential distortion to normalized coords (…,2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project(cam: Camera, Xc, distort: bool = False):
    """Camera-frame points (…,3) -> pixel coords (…,2).

    The reference projects *undistorted* keypoints everywhere after
    `UndistortKeyPoints`, so the matching/BA path uses distort=False; the
    raw-image path (feature sampling) uses distort=True.
    """
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xy = Xc[..., :2] * inv_z[..., None]
    if distort:
        xy = distort_normalized(cam, xy)
    u = cam.fx * xy[..., 0] + cam.cx
    v = cam.fy * xy[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Camera, Xc):
    """(…,3) -> (u, v, u_right) as used by stereo BA edges
    (g2o EdgeStereoSE3ProjectXYZ in the reference's Optimizer)."""
    uv = project(cam, Xc)
    z = jnp.maximum(Xc[..., 2], 1e-9)
    ur = uv[..., 0] - cam.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def backproject(cam: Camera, uv, depth):
    """Pixel coords (…,2) + depth (…,) -> camera-frame points (…,3).

    Replaces `Frame::UnprojectStereo` (reference: src/Frame.cc:665-681).
    Assumes uv are already undistorted (as the reference's mvKeysUn are).
    """
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def undistort_points(cam: Camera, uv, iters: int = 8):
    """Iteratively undistort pixel coords (…,2) -> ideal pixel coords.

    Fixed-point iteration identical in effect to cv::undistortPoints
    (which the reference calls in Frame.cc:401+); fixed `iters` keeps the
    loop jit-static.
    """
    x0 = (uv[..., 0] - cam.cx) / cam.fx
    y0 = (uv[..., 1] - cam.cy) / cam.fy
    xy = jnp.stack([x0, y0], axis=-1)
    guess = xy
    for _ in range(iters):
        x, y = guess[..., 0], guess[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        guess = jnp.stack([(xy[..., 0] - dx) / radial, (xy[..., 1] - dy) / radial], axis=-1)
    u = cam.fx * guess[..., 0] + cam.cx
    v = cam.fy * guess[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def undistorted_bounds(cam: Camera):
    """Undistorted image bounds (minX, maxX, minY, maxY) from the four
    corners, mirroring `Frame::ComputeImageBounds` (src/Frame.cc:382+)."""
    corners = jnp.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        jnp.float32,
    )
    if cam.has_distortion:
        und = undistort_points(cam, corners)
    else:
        und = corners
    min_x = jnp.minimum(und[0, 0], und[2, 0])
    max_x = jnp.maximum(und[1, 0], und[3, 0])
    min_y = jnp.minimum(und[0, 1], und[1, 1])
    max_y = jnp.maximum(und[2, 1], und[3, 1])
    return min_x, max_x, min_y, max_y
