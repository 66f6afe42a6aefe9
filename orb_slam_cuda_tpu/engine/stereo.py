"""Stereo / RGB-D depth association.

Replaces the reference's `Frame::ComputeStereoMatches`
(reference: src/Frame.cc:465-641 — per-row candidate buckets, Hamming
best match along the epipolar row, SAD subpixel refinement) and
`ComputeStereoFromRGBD` (:642-664). The row-bucket scan becomes one dense
masked (N_L, N_R) Hamming matmul with a row-window gate; the SAD subpixel
pass becomes a batched gather of correlation strips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Camera
from ..matching import core
from ..ops import hamming


@functools.partial(jax.jit, static_argnames=("scale_factors",))
def match_stereo(
    l_uv, l_oct, l_bip, l_valid,
    r_uv, r_oct, r_bip, r_valid,
    cam: Camera,
    scale_factors,
    left_img=None,
    right_img=None,
):
    """Left->right stereo matching on rectified pairs.

    Returns (u_right (N,), depth (N,)) with -1 where unmatched, matching
    the reference's mvuRight/mvDepth convention (src/Frame.cc:465-641):
      * row gate: |v_r - v_l| <= 2 * scale[octave_l] (the reference seeds
        row buckets with r = 2*scaleFactor, :487-497);
      * octave gate: within ±1 level;
      * disparity in [minD=0, maxD=bf/fx*fx... = cam.bf/minZ], minZ = b
        (reference :503-506: minD=0, maxD=mbf/minZ with minZ=mb);
      * Hamming <= (TH_HIGH+TH_LOW)/2 (thOrbDist, :481).
    """
    sf = jnp.asarray(scale_factors, jnp.float32)
    r_row = 2.0 * sf[jnp.clip(l_oct, 0, sf.shape[0] - 1)]
    dv = jnp.abs(l_uv[:, 1:2] - r_uv[None, :, 1])
    row_ok = dv <= r_row[:, None]
    oct_ok = jnp.abs(l_oct[:, None] - r_oct[None, :]) <= 1
    disparity = l_uv[:, 0:1] - r_uv[None, :, 0]  # uL - uR
    b = cam.bf / cam.fx  # baseline in meters
    min_z = b
    max_d = cam.bf / min_z
    disp_ok = (disparity > 0.01) & (disparity <= max_d)
    gate = row_ok & oct_ok & disp_ok & l_valid[:, None] & r_valid[None, :]

    dist = hamming.hamming_matrix(l_bip, r_bip).astype(jnp.float32)
    best_idx, best, _, _ = core.best_two(dist, gate)
    th_orb = (core.TH_HIGH + core.TH_LOW) / 2.0
    ok = best <= th_orb

    ur = r_uv[best_idx, 0]
    if left_img is not None and right_img is not None:
        # SAD subpixel refinement (reference src/Frame.cc:528-617): slide
        # an 11x11 intensity window (center-value-normalized) over ±5px
        # around the matched column ON THE KEYPOINT'S PYRAMID LEVEL
        # (coords scaled by 1/scale[octave], :541-545; the refined column
        # scales back by scale[octave], :591), parabola-fit the minimum.
        # Both pyramids are flattened into one buffer so the per-keypoint
        # level indexing is a single gather, not a per-level branch.
        ur_ref, sad_ok = _sad_subpixel(
            left_img.astype(jnp.float32), right_img.astype(jnp.float32),
            l_uv, l_oct, ur, scale_factors,
        )
        ur = jnp.where(sad_ok, ur_ref, ur)
        ok = ok & sad_ok

    disp = l_uv[:, 0] - ur
    ok = ok & (disp > 0.01)
    depth = cam.bf / jnp.maximum(disp, 1e-6)
    ur_out = jnp.where(ok, ur, -1.0)
    depth_out = jnp.where(ok, depth, -1.0)
    return ur_out, depth_out


_SAD_W = 5  # half window (11x11), reference Frame.cc:536
_SAD_L = 5  # search range ±5, reference Frame.cc:545


def _sad_subpixel(left, right, l_uv, l_oct, ur0, scale_factors):
    """Batched per-octave SAD correlation along the rectified row.

    Builds both image pyramids (static shapes), flattens them into one
    buffer, and gathers each keypoint's 11x11 windows from ITS OWN level
    via a per-keypoint base offset — the data-parallel form of the
    reference's per-keypoint level-image loop (src/Frame.cc:528-617).
    Returns (ur_refined at level-0 scale, ok)."""
    from ..frontend import image_ops

    n_levels = len(scale_factors)
    h, w = left.shape
    shapes = image_ops.pyramid_shapes(h, w, n_levels, float(scale_factors[1]) if n_levels > 1 else 1.0)
    pl_levels = image_ops.build_pyramid(left, n_levels, float(scale_factors[1]) if n_levels > 1 else 1.0)
    pr_levels = image_ops.build_pyramid(right, n_levels, float(scale_factors[1]) if n_levels > 1 else 1.0)
    flat_l = jnp.concatenate([p.reshape(-1) for p in pl_levels])
    flat_r = jnp.concatenate([p.reshape(-1) for p in pr_levels])
    offs = np.concatenate([[0], np.cumsum([hh * ww for hh, ww in shapes])])[:-1]
    hs = jnp.asarray([hh for hh, _ in shapes], jnp.int32)
    ws = jnp.asarray([ww for _, ww in shapes], jnp.int32)
    offs = jnp.asarray(offs, jnp.int32)
    sf = jnp.asarray(scale_factors, jnp.float32)

    N = l_uv.shape[0]
    dy = jnp.arange(-_SAD_W, _SAD_W + 1)
    dx = jnp.arange(-_SAD_W, _SAD_W + 1)

    oct_c = jnp.clip(l_oct, 0, n_levels - 1)
    inv_s = 1.0 / sf[oct_c]
    yl = jnp.round(l_uv[:, 1] * inv_s).astype(jnp.int32)
    xl = jnp.round(l_uv[:, 0] * inv_s).astype(jnp.int32)
    xr0 = jnp.round(ur0 * inv_s).astype(jnp.int32)
    base = offs[oct_c]
    h_k = hs[oct_c]
    w_k = ws[oct_c]

    def patch(flat, ys, xs):
        yy = jnp.clip(ys[:, None, None] + dy[None, :, None], 0, (h_k - 1)[:, None, None])
        xx = jnp.clip(xs[:, None, None] + dx[None, None, :], 0, (w_k - 1)[:, None, None])
        return flat[base[:, None, None] + yy * w_k[:, None, None] + xx]

    pl = patch(flat_l, yl, xl)
    pl = pl - pl[:, _SAD_W : _SAD_W + 1, _SAD_W : _SAD_W + 1]
    sads = []
    for off in range(-_SAD_L, _SAD_L + 1):
        pr = patch(flat_r, yl, xr0 + off)
        pr = pr - pr[:, _SAD_W : _SAD_W + 1, _SAD_W : _SAD_W + 1]
        sads.append(jnp.sum(jnp.abs(pl - pr), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)  # (N, 2L+1)
    best = jnp.argmin(sad, axis=1)
    interior = (best > 0) & (best < 2 * _SAD_L)
    bi = jnp.clip(best, 1, 2 * _SAD_L - 1)
    rows = jnp.arange(N)
    c = sad[rows, bi]
    l_ = sad[rows, bi - 1]
    r_ = sad[rows, bi + 1]
    denom = l_ + r_ - 2.0 * c
    delta = jnp.where(jnp.abs(denom) > 1e-6, (l_ - r_) / (2.0 * denom), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    # Back to level-0 scale (reference :591).
    ur_ref = sf[oct_c] * (
        xr0.astype(jnp.float32) + (bi - _SAD_L).astype(jnp.float32) + delta
    )
    return ur_ref, interior


@jax.jit
def depth_from_rgbd(uv_raw, valid, depth_map, cam: Camera, depth_factor=1.0):
    """Per-keypoint depth lookup + virtual right coordinate
    (reference Frame::ComputeStereoFromRGBD, src/Frame.cc:642-664: depth
    sampled at the RAW keypoint position, ur = u_undistorted - bf/depth)."""
    h, w = depth_map.shape
    x = jnp.clip(jnp.round(uv_raw[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(uv_raw[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_map[y, x].astype(jnp.float32) * depth_factor
    ok = valid & (d > 0)
    depth = jnp.where(ok, d, -1.0)
    return depth


def virtual_right(uv_und, depth, cam: Camera):
    """ur = u - bf/z for valid depths."""
    ok = depth > 0
    return jnp.where(ok, uv_und[:, 0] - cam.bf / jnp.maximum(depth, 1e-6), -1.0)
