"""Pallas TPU kernel for FAST-9 corner scoring (both thresholds fused).

The Pallas counterpart of the reference's vxFastCornersNode (reference:
src/ORBextractor.cc:763) and of frontend/fast.py's XLA formulation.

Design: the 16-offset circle comparison materializes 16 shifted copies of
the image — at KITTI level-0 scale that is ~30 MB of f32, double VMEM's
16 MB. The kernel therefore runs on a 1-D grid of row tiles: each step
DMAs its tile plus a halo from HBM into a VMEM scratch buffer
(pltpu.make_async_copy), computes both threshold score maps for the tile
in one pass, and writes the two (tile, W) output blocks. The jnp path
(frontend/fast.py) computes the 16 shifted views once per threshold; this
kernel shares them — and keeps the halo exchange in VMEM instead of
re-reading HBM per threshold.

Mosaic alignment rules shape the whole layout (the round-2 on-chip
failure was a memref slice of width 1247, not a multiple of the 128-lane
tiling):
  * the host pads the image width to a multiple of 128 so every
    HBM<->VMEM transfer moves full lane tiles;
  * the row halo is 8 (one full sublane tile), so DMA start offsets,
    window heights, and the in-kernel row slice are all 8-aligned;
  * the 16 circle shifts are lane/sublane rotations (pltpu.roll) of the
    whole buffer rather than unaligned slices; rotation wrap-around only
    touches columns the interior mask already discards.

Verification status: interpret-mode equality vs frontend/fast.py is in
tests/test_utils.py; on-chip equality + timing is tools/ab_pallas_fast.py
(run it on the real device before enabling `use_pallas_fast` anywhere).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..frontend.fast import CIRCLE, _ARC

_TILE = 32  # rows per grid step (VMEM budget: ~16 views x tile x W x 4B)
_HALO = 3  # FAST circle radius (x-axis halo added by the host)
# DMA row halo: one full 8-row sublane tile, so copy windows
# (tile + 2*_ROW_HALO rows) and the in-kernel center-row slice
# (offset _ROW_HALO) are both aligned to Mosaic's sublane tiling.
_ROW_HALO = 8


def _fast_kernel(img_ref, hi_ref, lo_ref, buf, sem, *, th_hi, th_lo,
                 height, width, tile, w_buf):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    rows = tile + 2 * _ROW_HALO
    # The image arrives edge-padded by _ROW_HALO rows on top (and enough
    # at the bottom), so tile i's halo window starts at padded row i*tile
    # (8-aligned) and the tile itself always sits at buffer offset
    # _ROW_HALO. Copy height `rows` and width `w_buf` are tile-aligned.
    start = i * tile

    pltpu.make_async_copy(
        img_ref.at[pl.ds(start, rows), :], buf, sem
    ).start()
    pltpu.make_async_copy(
        img_ref.at[pl.ds(start, rows), :], buf, sem
    ).wait()

    padb = buf[:]  # (rows, w_buf); column c holds image column c - _HALO

    def shift(arr, dy, dx):
        # view[r, c] == padb[r + dy, c + dx]: circular rotation instead of
        # an unaligned slice. No row wrap occurs (|dy| <= 3 < _ROW_HALO);
        # column wrap only pollutes |dx| edge columns, which the interior
        # mask below excludes.
        out = arr
        if dy:
            out = pltpu.roll(out, (rows - dy) % rows, 0)
        if dx:
            out = pltpu.roll(out, (w_buf - dx) % w_buf, 1)
        return out

    center = padb[_ROW_HALO : _ROW_HALO + tile, :]
    views = [
        shift(padb, dy, dx)[_ROW_HALO : _ROW_HALO + tile, :]
        for dy, dx in CIRCLE
    ]
    shifted = jnp.stack(views, axis=0)  # (16, tile, w_buf)
    diff = shifted - center[None]

    def arc_score(margin):
        mins = margin
        rolled = margin
        n_circ = margin.shape[0]
        for _ in range(_ARC - 1):
            # pltpu.roll wants a non-negative shift; +(n-1) == -1 mod n.
            rolled = pltpu.roll(rolled, n_circ - 1, 0)
            mins = jnp.minimum(mins, rolled)
        return jnp.max(mins, axis=0)

    score = jnp.maximum(arc_score(diff), arc_score(-diff))
    ys = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, w_buf), 0)
    # Output column c is image column c - _HALO (host slices the halo off).
    img_x = jax.lax.broadcasted_iota(jnp.int32, (tile, w_buf), 1) - _HALO
    interior = (
        (ys >= _HALO) & (ys < height - _HALO)
        & (img_x >= _HALO) & (img_x < width - _HALO)
    )
    hi_ref[:] = jnp.where((score > th_hi) & interior, score, 0.0)
    lo_ref[:] = jnp.where((score > th_lo) & interior, score, 0.0)


@functools.partial(
    jax.jit, static_argnames=("th_hi", "th_lo", "interpret")
)
def fast_score_pallas(img, th_hi: float, th_lo: float, interpret: bool = False):
    """(H,W) float32 image -> (score_hi, score_lo) maps, one tiled pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img.shape
    # Tile height must be a multiple of 8 so both the grid-step start
    # offsets (i*tile) and the DMA window heights (tile + 2*_ROW_HALO)
    # satisfy Mosaic's sublane-tiling alignment.
    tile = min(_TILE, max(8, -(-h // 8) * 8))
    n_tiles = -(-h // tile)
    h_padded = n_tiles * tile + 2 * _ROW_HALO
    # Width (including the circle halo) padded to the 128-lane tiling so
    # every memref slice the kernel takes is lane-aligned.
    w_buf = -(-(w + 2 * _HALO) // 128) * 128
    img_p = jnp.pad(
        img.astype(jnp.float32),
        ((_ROW_HALO, h_padded - h - _ROW_HALO), (_HALO, w_buf - w - _HALO)),
        mode="edge",
    )
    kernel = functools.partial(
        _fast_kernel, th_hi=th_hi, th_lo=th_lo, height=h, width=w,
        tile=tile, w_buf=w_buf,
    )
    out_shape = jax.ShapeDtypeStruct((n_tiles * tile, w_buf), jnp.float32)
    out_spec = pl.BlockSpec((tile, w_buf), lambda i: (i, 0))
    hi, lo = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=(out_shape, out_shape),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _ROW_HALO, w_buf), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p)
    return hi[:h, _HALO : _HALO + w], lo[:h, _HALO : _HALO + w]
