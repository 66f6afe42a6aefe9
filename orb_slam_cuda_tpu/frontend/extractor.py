"""The ORB extraction graph: pyramid → FAST → spatial top-K → IC-angle →
blur → rBRIEF, as one jitted function.

TPU-native replacement for the reference's persistent OpenVX graph
(reference: src/ORBextractor.cc:562-798 buildGraph, :1538-1815
operator()) and its custom kernels (src/CustomNodes.cc: makeGrid :136-272,
makeQuadtree :273-572, computeAngle :575-663, ORB :720-853, scaleArray
:854-908). The sequential quadtree distribution (`DistributeOctTree`,
src/ORBextractor.cc:889-1120) is re-specified as grid-bucketed top-K with
rank-then-score ordering — same objective (spatially even, response-ranked
keypoints), but data-parallel.

Design notes:
  * All shapes static per (height, width, config): one compile per camera.
  * Output is a fixed-capacity `Features` batch with a validity mask —
    the array-world equivalent of the reference's variable-length
    vector<KeyPoint>.
  * Descriptors are 256-bit packed into (N,8) uint32 little-endian over the
    reference's 32-byte layout (byte k = pattern pairs 8k..8k+7, LSB
    first), preserving compatibility with ORBvoc-style vocabularies.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fast, image_ops

_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "brief_pattern_31.npy")
HALF_PATCH = 15  # IC-angle circular patch radius (reference HALF_PATCH_SIZE)
EDGE_THRESHOLD = 19  # keypoint exclusion border (reference ORBextractor.cc:75)


class ExtractorConfig(NamedTuple):
    """Mirrors the reference's ORBextractor settings block
    (src/Tracking.cc:131-141: nFeatures/scaleFactor/nLevels/iniThFAST/minThFAST)."""

    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    # rBRIEF rotation handling: >0 quantizes orientation into this many
    # bins and samples descriptors through precomputed per-bin one-hot
    # matmuls on the MXU (the original ORB paper's 12-degree lookup-table
    # design; 30 bins = 12 deg). 0 = continuous rotation via per-sample
    # gathers (exact reference arithmetic, src/ORBextractor.cc:195-233,
    # but gather-bound on TPU).
    rotation_bins: int = 30
    # FAST corner scoring backend: True routes through the fused Pallas
    # two-threshold kernel (ops/pallas_fast.py — one VMEM pass emits both
    # score maps; the XLA path computes the 16 shifted views per
    # threshold). Only valid on the TPU backend (the engine auto-selects;
    # tests exercise the kernel in interpret mode).
    use_pallas_fast: bool = False

    def features_per_level(self):
        """Geometric per-level quota, identical in spirit to the reference
        ctor's mnFeaturesPerLevel computation (src/ORBextractor.cc:509-527)."""
        factor = 1.0 / self.scale_factor
        n_first = self.n_features * (1 - factor) / (1 - factor**self.n_levels)
        quotas = []
        acc = 0
        for lvl in range(self.n_levels - 1):
            q = int(round(n_first * factor**lvl))
            quotas.append(q)
            acc += q
        quotas.append(max(self.n_features - acc, 0))
        return quotas

    def scale_factors(self):
        return [self.scale_factor**lvl for lvl in range(self.n_levels)]


class Features(NamedTuple):
    """Fixed-capacity keypoint batch (capacity = config.n_features).

    uv: (N,2) float32 level-0 pixel coords (raw/distorted image frame).
    response: (N,) float32 FAST score.
    octave: (N,) int32 pyramid level.
    angle: (N,) float32 orientation in degrees ([0,360), reference
      convention from IC_Angle/fastAtan2).
    desc: (N,8) uint32 packed 256-bit rBRIEF.
    valid: (N,) bool.
    """

    uv: jnp.ndarray
    response: jnp.ndarray
    octave: jnp.ndarray
    angle: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self):
        return self.uv.shape[-2]


def load_brief_pattern() -> np.ndarray:
    """(256,4) int8 canonical ORB pattern (Rublee et al.'s learned pairs;
    the same public constant as reference src/ORBextractor.cc:236-494)."""
    return np.load(_PATTERN_PATH)


def _ic_angle_offsets():
    """Circular-patch offset table for IC-angle: (M,2) int32 (dy,dx) with
    |dx| <= umax[|dy|], the exact circle the reference iterates
    (src/ORBextractor.cc:164-191 IC_Angle, umax from ctor :529-556)."""
    umax = np.zeros(HALF_PATCH + 1, np.int32)
    vmax = int(math.floor(HALF_PATCH * math.sqrt(2.0) / 2 + 1))
    vmin = int(math.ceil(HALF_PATCH * math.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(round(math.sqrt(HALF_PATCH * HALF_PATCH - v * v)))
    # Symmetry completion (reference ctor loop).
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    offs = []
    for dy in range(-HALF_PATCH, HALF_PATCH + 1):
        u = int(umax[abs(dy)])
        for dx in range(-u, u + 1):
            offs.append((dy, dx))
    return np.array(offs, np.int32)


_IC_OFFSETS = _ic_angle_offsets()


def _select_spatial_topk(score, quota: int, border: int):
    """Grid-bucketed spatial top-K replacing the sequential quadtree
    (reference src/ORBextractor.cc:889-1120 DistributeOctTree).

    Order candidates by (per-bin rank, -score) and keep `quota`: every
    occupied bin contributes its best corner before any bin contributes a
    second one — the same spatial-evenness objective as the quadtree, but
    expressible as two batched top-k calls.

    Returns (ys, xs, scores, valid) each (quota,).
    """
    h, w = score.shape
    # Exclude the EDGE_THRESHOLD border (reference keeps keypoints inside
    # [19, dim-19) so the 31px IC patch and rotated BRIEF stay in-image).
    ys_g = jnp.arange(h)[:, None]
    xs_g = jnp.arange(w)[None, :]
    inb = (ys_g >= border) & (ys_g < h - border) & (xs_g >= border) & (xs_g < w - border)
    score = jnp.where(inb, score, 0.0)

    # Static bin size ~ one bin per desired keypoint.
    bin_size = int(np.clip(round(math.sqrt(h * w / max(quota, 1))), 16, 64))
    rank_depth = 4
    ph = (-h) % bin_size
    pw = (-w) % bin_size
    sp = jnp.pad(score, ((0, ph), (0, pw)))
    hb, wb = (h + ph) // bin_size, (w + pw) // bin_size
    binned = sp.reshape(hb, bin_size, wb, bin_size).transpose(0, 2, 1, 3)
    binned = binned.reshape(hb * wb, bin_size * bin_size)
    top_v, top_i = jax.lax.top_k(binned, rank_depth)  # (B,R)

    # Recover absolute coords of each candidate.
    bin_ids = jnp.arange(hb * wb)
    by = (bin_ids // wb)[:, None] * bin_size
    bx = (bin_ids % wb)[:, None] * bin_size
    cy = by + top_i // bin_size
    cx = bx + top_i % bin_size

    ranks = jnp.broadcast_to(jnp.arange(rank_depth)[None, :], top_v.shape)
    valid = top_v > 0.0
    # Key: lower rank first, then higher score. Scores are FAST margins
    # (< 1024), so rank*2048 dominates.
    key = jnp.where(valid, ranks.astype(jnp.float32) * 2048.0 - top_v, jnp.inf)
    flat_key = key.reshape(-1)
    sel = jax.lax.top_k(-flat_key, quota)[1]  # indices of smallest keys
    ys = cy.reshape(-1)[sel]
    xs = cx.reshape(-1)[sel]
    vs = top_v.reshape(-1)[sel]
    ok = valid.reshape(-1)[sel]
    return ys, xs, vs, ok


def _ic_angle(img, ys, xs):
    """Intensity-centroid orientation in degrees for keypoints (N,) on one
    level image (reference src/ORBextractor.cc:164-191)."""
    h, w = img.shape
    flat = img.reshape(-1)
    dy = jnp.asarray(_IC_OFFSETS[:, 0])
    dx = jnp.asarray(_IC_OFFSETS[:, 1])
    yy = jnp.clip(ys[:, None] + dy[None, :], 0, h - 1)
    xx = jnp.clip(xs[:, None] + dx[None, :], 0, w - 1)
    vals = flat[yy * w + xx]  # (N,M)
    m10 = jnp.sum(vals * dx[None, :].astype(jnp.float32), axis=1)
    m01 = jnp.sum(vals * dy[None, :].astype(jnp.float32), axis=1)
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    return jnp.where(ang < 0, ang + 360.0, ang)


# --- MXU descriptor path -----------------------------------------------
# Per-keypoint work (IC-angle moments + rotated-BRIEF sampling) is
# gather-bound when expressed as image gathers (~20 ns/element on TPU).
# Instead: extract one 39x39 patch per keypoint (window slices), compute
# moments as two matvecs, and sample the 512 rotated pattern positions
# through per-rotation-bin one-hot matrices on the MXU — the original ORB
# paper's rotation-LUT design (Rublee et al., sec. 4.3: "discretize the
# angle to increments of 2pi/30 (12 degrees)"), with the LUT realised as
# a batched matmul instead of per-keypoint table walks.

DESC_PATCH = 39  # covers rotated BRIEF offsets: max pattern radius 18.4
DESC_C = 19  # patch center; == EDGE_THRESHOLD so slices never clamp


def _extract_patches(img, ys, xs):
    """(N, 39, 39) patches centered on keypoints (window dynamic-slices;
    keypoints live >= EDGE_THRESHOLD from the border so slices are
    in-bounds)."""

    def onep(y, x):
        return jax.lax.dynamic_slice(
            img, (y - DESC_C, x - DESC_C), (DESC_PATCH, DESC_PATCH)
        )

    return jax.vmap(onep)(ys, xs)


def _angle_moment_weights():
    """(P*P,) m10/m01 weight vectors over the flattened 39x39 patch,
    encoding the reference's circular IC patch (src/ORBextractor.cc:
    164-191) so the moments become two matvecs."""
    w10 = np.zeros(DESC_PATCH * DESC_PATCH, np.float32)
    w01 = np.zeros(DESC_PATCH * DESC_PATCH, np.float32)
    for dy, dx in _IC_OFFSETS:
        i = (dy + DESC_C) * DESC_PATCH + (dx + DESC_C)
        w10[i] = dx
        w01[i] = dy
    return w10, w01


_W10, _W01 = _angle_moment_weights()


def _ic_angle_from_patches(patches_flat):
    """IC-angle in degrees from flattened raw patches (N, 39*39)."""
    m10 = patches_flat @ jnp.asarray(_W10)
    m01 = patches_flat @ jnp.asarray(_W01)
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    return jnp.where(ang < 0, ang + 360.0, ang)


def build_rotation_onehot(pattern_np: np.ndarray, nbins: int) -> np.ndarray:
    """(B, 512, 39*39) bfloat16 one-hot sampling matrices: row s of bin b
    picks the patch pixel at the pattern point rotated by b*360/B deg with
    the reference's rounding (row = round(px*sin + py*cos), col =
    round(px*cos - py*sin), src/ORBextractor.cc:205-207). Rows 0..255 are
    the pattern's first points, 256..511 the second points."""
    F = DESC_PATCH * DESC_PATCH
    out = np.zeros((nbins, 512, F), np.float32)
    px = np.concatenate([pattern_np[:, 0], pattern_np[:, 2]]).astype(np.float64)
    py = np.concatenate([pattern_np[:, 1], pattern_np[:, 3]]).astype(np.float64)
    for b in range(nbins):
        th = np.radians(b * 360.0 / nbins)
        a, s = np.cos(th), np.sin(th)
        r = np.rint(px * s + py * a).astype(np.int64)
        c = np.rint(px * a - py * s).astype(np.int64)
        idx = (r + DESC_C) * DESC_PATCH + (c + DESC_C)
        out[b, np.arange(512), idx] = 1.0
    return out.astype(jnp.bfloat16)


def _rbrief_binned(patches_flat, angle_deg, onehot, nbins: int):
    """Rotated BRIEF via per-bin one-hot MXU matmuls; packed (N,8) uint32.

    The one-hot pick is exact; values compare at bfloat16 precision,
    commensurate with the reference comparing uint8-blurred intensities
    (src/ORBextractor.cc:216-233)."""
    n = patches_flat.shape[0]
    step = 360.0 / nbins
    bins = jnp.mod(jnp.rint(angle_deg / step).astype(jnp.int32), nbins)
    pb = patches_flat.astype(jnp.bfloat16)
    acc = jnp.zeros((n, 512), jnp.float32)
    for b in range(nbins):
        s = jax.lax.dot_general(
            pb, onehot[b], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = jnp.where((bins == b)[:, None], s, acc)
    bits = (acc[:, :256] < acc[:, 256:]).astype(jnp.uint32)
    shifts = jnp.asarray(
        [jnp.uint32(1) << jnp.uint32(i) for i in range(32)], jnp.uint32
    )
    words = bits.reshape(n, 8, 32) * shifts[None, None, :]
    return jnp.sum(words, axis=-1, dtype=jnp.uint32)


def _rbrief(blurred, ys, xs, angle_deg, pattern):
    """Rotated BRIEF descriptors, packed (N,8) uint32.

    Rotation/rounding matches the reference kernel
    (src/ORBextractor.cc:195-233 computeOrbDescriptor): sample offset
    row = round(px*sin + py*cos), col = round(px*cos - py*sin), from the
    7x7-Gaussian-blurred level image; bit = I(p1) < I(p2), byte k holds
    pairs 8k..8k+7 LSB-first.
    """
    h, w = blurred.shape
    flat = blurred.reshape(-1)
    a = jnp.cos(jnp.radians(angle_deg))[:, None]  # (N,1)
    b = jnp.sin(jnp.radians(angle_deg))[:, None]
    px1 = pattern[:, 0].astype(jnp.float32)[None, :]  # (1,256)
    py1 = pattern[:, 1].astype(jnp.float32)[None, :]
    px2 = pattern[:, 2].astype(jnp.float32)[None, :]
    py2 = pattern[:, 3].astype(jnp.float32)[None, :]

    def sample(px, py):
        r = jnp.rint(px * b + py * a).astype(jnp.int32)
        c = jnp.rint(px * a - py * b).astype(jnp.int32)
        yy = jnp.clip(ys[:, None] + r, 0, h - 1)
        xx = jnp.clip(xs[:, None] + c, 0, w - 1)
        return flat[yy * w + xx]  # (N,256)

    bits = (sample(px1, py1) < sample(px2, py2)).astype(jnp.uint32)  # (N,256)
    # Pack little-endian over the 32-byte sequence -> 8 uint32 words.
    shifts = jnp.asarray([jnp.uint32(1) << jnp.uint32(i) for i in range(32)], jnp.uint32)
    words = bits.reshape(bits.shape[0], 8, 32) * shifts[None, None, :]
    return jnp.sum(words, axis=-1, dtype=jnp.uint32)


class ORBExtractor:
    """Persistent extraction graph for a fixed image size — the analogue of
    the reference's one-vx_graph-per-ORBextractor design (the fork requires
    Camera.width/height in settings for the same reason,
    src/Tracking.cc:124-127)."""

    def __init__(self, config: ExtractorConfig, height: int, width: int):
        self.config = config
        self.height = height
        self.width = width
        self.pattern = jnp.asarray(load_brief_pattern(), jnp.int32)
        if config.rotation_bins > 0:
            self.rot_onehot = jnp.asarray(
                build_rotation_onehot(load_brief_pattern(), config.rotation_bins)
            )
        else:
            self.rot_onehot = None
        self._extract = jax.jit(functools.partial(self._extract_impl))

    def __call__(self, image) -> Features:
        """image: (H,W) uint8/float32 grayscale -> Features."""
        return self._extract(jnp.asarray(image))

    def _extract_impl(self, image) -> Features:
        cfg = self.config
        levels = image_ops.build_pyramid(image, cfg.n_levels, cfg.scale_factor)
        quotas = cfg.features_per_level()
        scales = cfg.scale_factors()

        binned = cfg.rotation_bins > 0
        uts, ress, octs, angs, descs, vals = [], [], [], [], [], []
        praws, pblurs = [], []
        for lvl, (img_l, quota, scale) in enumerate(zip(levels, quotas, scales)):
            if cfg.use_pallas_fast:
                from ..ops.pallas_fast import fast_score_pallas

                raw_hi, raw_lo = fast_score_pallas(
                    img_l, cfg.ini_th_fast, cfg.min_th_fast
                )
                s_hi = fast.nms3x3(raw_hi)
                s_lo = fast.nms3x3(raw_lo)
            else:
                s_hi = fast.nms3x3(fast.fast_score(img_l, cfg.ini_th_fast))
                s_lo = fast.nms3x3(fast.fast_score(img_l, cfg.min_th_fast))
            score = fast.two_threshold_cell_select(s_hi, s_lo)
            ys, xs, resp, ok = _select_spatial_topk(score, quota, EDGE_THRESHOLD)
            blurred = image_ops.separable_gaussian(img_l, 7, 2.0)
            if binned:
                # Collect patches; angle + descriptors run batched over
                # all levels after the loop (MXU path).
                praws.append(_extract_patches(img_l, ys, xs).reshape(quota, -1))
                pblurs.append(_extract_patches(blurred, ys, xs).reshape(quota, -1))
            else:
                ang = _ic_angle(img_l, ys, xs)
                angs.append(ang)
                descs.append(_rbrief(blurred, ys, xs, ang, self.pattern))
            # Scale coords back to level 0 (reference scaleArray_kernel,
            # src/CustomNodes.cc:854-908).
            uv = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], axis=-1) * scale
            uts.append(uv)
            ress.append(resp)
            octs.append(jnp.full((quota,), lvl, jnp.int32))
            vals.append(ok)

        if binned:
            raw_flat = jnp.concatenate(praws, axis=0)
            blur_flat = jnp.concatenate(pblurs, axis=0)
            angle = _ic_angle_from_patches(raw_flat)
            desc = _rbrief_binned(
                blur_flat, angle, self.rot_onehot, cfg.rotation_bins
            )
        else:
            angle = jnp.concatenate(angs, axis=0)
            desc = jnp.concatenate(descs, axis=0)

        return Features(
            uv=jnp.concatenate(uts, axis=0),
            response=jnp.concatenate(ress, axis=0),
            octave=jnp.concatenate(octs, axis=0),
            angle=angle,
            desc=desc,
            valid=jnp.concatenate(vals, axis=0),
        )


def descriptors_to_bytes(desc):
    """(N,8) uint32 -> (N,32) uint8 in the reference's byte order."""
    d = np.asarray(desc)
    out = np.zeros((d.shape[0], 32), np.uint8)
    for wi in range(8):
        for bi in range(4):
            out[:, wi * 4 + bi] = (d[:, wi] >> (8 * bi)) & 0xFF
    return out
