"""Vectorized FAST-9 corner detection with scores and 3x3 NMS.

TPU-native replacement for the reference's `vxFastCornersNode` per pyramid
level (reference: src/ORBextractor.cc:763) and the OpenCV CPU fallback
`FAST(...)` per 30px cell (src/ORBextractor.cc:1258-1298). Instead of a
sparse corner list, the whole level is evaluated dense as (H,W) score
maps — the natural TPU formulation: 16 shifted views of the image and a
circular 9-contiguous segment test, all as fused VPU element-wise ops.

Score semantics follow OpenCV's FAST score (max threshold at which the
pixel is still a corner), computed in closed form: for every 9-long arc
take the min margin, then max over the 16 arcs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 — the 16 FAST offsets (row, col), clockwise.
CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

_ARC = 9  # FAST-9: contiguous arc length


def _shifted_stack(img):
    """(16,H,W) of the image sampled at the 16 circle offsets.

    Implemented with pad + static slices (free in XLA, no gathers)."""
    h, w = img.shape
    p = jnp.pad(img, 3, mode="edge")
    views = [p[3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w] for dy, dx in CIRCLE]
    return jnp.stack(views, axis=0)


def fast_score(img, threshold: float):
    """Dense FAST-9 score map.

    Args:
      img: (H,W) float32 grayscale.
      threshold: detection threshold t (reference iniThFAST=20 / minThFAST=7,
        parsed at src/Tracking.cc:137-141).

    Returns:
      score: (H,W) float32, 0 where not a corner, else the OpenCV-style
        corner score (strictly > threshold where detected).
    """
    shifted = _shifted_stack(img)  # (16,H,W)
    diff = shifted - img[None]  # circle minus center

    # Margins for the two polarities.
    bright = diff  # pixel on circle brighter than center by > t
    dark = -diff

    def arc_score(margin):
        # For each start s: min over the 9 consecutive offsets; then max over s.
        # Unrolled: rolled views along axis 0 (static, 16*9 elementwise mins).
        mins = margin
        rolled = margin
        for _ in range(_ARC - 1):
            rolled = jnp.roll(rolled, -1, axis=0)
            mins = jnp.minimum(mins, rolled)
        return jnp.max(mins, axis=0)  # (H,W) max-min margin

    score_b = arc_score(bright)
    score_d = arc_score(dark)
    score = jnp.maximum(score_b, score_d)
    is_corner = score > threshold
    # Border exclusion: the 3px ring where the circle leaves the image.
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(is_corner & interior, score, 0.0)


def nms3x3(score):
    """3x3 non-maximum suppression, as OpenCV FAST applies
    (nonmaxSuppression=true at reference src/ORBextractor.cc:1262)."""
    h, w = score.shape
    p = jnp.pad(score, 1, mode="constant")
    neigh = jnp.stack(
        [
            p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)
        ],
        axis=0,
    )
    keep = score >= jnp.max(neigh, axis=0)
    return jnp.where(keep, score, 0.0)


def two_threshold_cell_select(score_hi, score_lo, cell: int = 32):
    """Reference semantics of the per-cell threshold fallback
    (src/ORBextractor.cc:1258-1298 and the grid kernel
    src/CustomNodes.cc:136-272): each cell first runs FAST at the high
    threshold; only if the cell found nothing does it accept low-threshold
    corners.

    Args:
      score_hi / score_lo: (H,W) NMS'd score maps at iniThFAST / minThFAST.
      cell: cell size in pixels (reference uses 30; 32 here keeps the
        reduce-window shapes power-of-two aligned — the fallback semantics,
        not the exact cell pitch, is what affects robustness).

    Returns:
      (H,W) combined score map.
    """
    h, w = score_hi.shape
    ph = (-h) % cell
    pw = (-w) % cell
    hi = jnp.pad(score_hi, ((0, ph), (0, pw)))
    hb = hi.reshape((h + ph) // cell, cell, (w + pw) // cell, cell)
    cell_has_hi = jnp.max(hb, axis=(1, 3)) > 0.0  # (Hc,Wc)
    cell_mask = jnp.repeat(jnp.repeat(cell_has_hi, cell, axis=0), cell, axis=1)[:h, :w]
    return jnp.where(cell_mask, score_hi, score_lo)
