"""Pallas TPU kernel for FAST-9 corner scoring (both thresholds fused).

The Pallas counterpart of the reference's vxFastCornersNode (reference:
src/ORBextractor.cc:763) and of frontend/fast.py's XLA formulation.

Design: the 16-offset circle comparison materializes 16 shifted copies of
the image — at KITTI level-0 scale that is ~30 MB of f32, double VMEM's
16 MB. The kernel therefore runs on a 1-D grid of row tiles: each step
DMAs its tile plus a 3-row halo from HBM into a VMEM scratch buffer
(pltpu.make_async_copy), computes both threshold score maps for the tile
in one pass, and writes the two (tile, W) output blocks. The jnp path
(frontend/fast.py) computes the 16 shifted views once per threshold; this
kernel shares them — and keeps the halo exchange in VMEM instead of
re-reading HBM per threshold.

The extractor uses this kernel when `ExtractorConfig.use_pallas_fast` is
set (the engine auto-selects it on the TPU backend);
frontend/fast.py remains the reference implementation and the CPU/test
path (the kernel is verified against it in interpret mode and on-chip by
tools/ab_pallas_fast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..frontend.fast import CIRCLE, _ARC

_TILE = 64  # rows per grid step (VMEM budget: ~16 views x tile x W x 4B)
_HALO = 3  # FAST circle radius
# DMA row halo: Mosaic requires HBM->VMEM slice heights aligned to the
# 8-row sublane tiling, so the copy window is tile + 2*_ROW_HALO rows
# (a multiple of 8 whenever tile is), one spare row beyond the circle
# radius on each side.
_ROW_HALO = 4


def _fast_kernel(img_ref, hi_ref, lo_ref, buf, sem, *, th_hi, th_lo,
                 height, width, h_padded, tile):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    rows = tile + 2 * _ROW_HALO
    # The image arrives edge-padded by _ROW_HALO rows on top (and enough
    # at the bottom), so tile i's halo window starts at padded row i*tile
    # (8-aligned) and the tile itself always sits at buffer offset
    # _ROW_HALO; the copy height `rows` is a multiple of 8 (Mosaic's
    # sublane tiling constraint on memref slices).
    start = i * tile
    off = _ROW_HALO

    pltpu.make_async_copy(
        img_ref.at[pl.ds(start, rows), :], buf, sem
    ).start()
    pltpu.make_async_copy(
        img_ref.at[pl.ds(start, rows), :], buf, sem
    ).wait()

    # The x axis arrives pre-padded by _HALO on each side (host side);
    # in-kernel edge padding lowers poorly through Mosaic. All slice
    # bounds below are static (off == _HALO), which Mosaic requires.
    padb = buf[:]

    center = padb[off : off + tile, _HALO : _HALO + width]
    views = [
        padb[off + dy : off + dy + tile, _HALO + dx : _HALO + dx + width]
        for dy, dx in CIRCLE
    ]
    shifted = jnp.stack(views, axis=0)  # (16, tile, W)
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
    ys = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (tile, width), 1)
    interior = (
        (ys >= _HALO) & (ys < height - _HALO)
        & (xs >= _HALO) & (xs < width - _HALO)
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
    img_p = jnp.pad(
        img.astype(jnp.float32),
        ((_ROW_HALO, h_padded - h - _ROW_HALO), (_HALO, _HALO)),
        mode="edge",
    )
    kernel = functools.partial(
        _fast_kernel, th_hi=th_hi, th_lo=th_lo, height=h, width=w,
        h_padded=h_padded, tile=tile,
    )
    out_shape = jax.ShapeDtypeStruct((n_tiles * tile, w), jnp.float32)
    out_spec = pl.BlockSpec((tile, w), lambda i: (i, 0))
    hi, lo = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=(out_shape, out_shape),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _ROW_HALO, w + 2 * _HALO), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p)
    return hi[:h], lo[:h]
