"""Pallas TPU kernel for FAST-9 corner scoring (both thresholds fused).

The Pallas counterpart of the reference's vxFastCornersNode (reference:
src/ORBextractor.cc:763) and of frontend/fast.py's XLA formulation. A
pyramid level fits VMEM whole (level 0 at KITTI scale is ~1.8 MB f32),
so the kernel keeps the image resident and emits BOTH threshold score
maps (iniThFAST and minThFAST) in one pass — the two-threshold cell
fallback (src/ORBextractor.cc:1258-1298) needs both, and the jnp path
computes the 16 shifted views twice.

The extractor uses this kernel when `ExtractorConfig.use_pallas_fast`
is set and the backend is TPU; frontend/fast.py remains the reference
implementation and the CPU/test path (the kernel is verified against it
in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..frontend.fast import CIRCLE, _ARC


def _fast_kernel(img_ref, hi_out, lo_out, *, th_hi, th_lo, height, width):
    img = img_ref[:]
    pad = jnp.pad(img, 3, mode="edge")
    views = [
        jax.lax.slice(pad, (3 + dy, 3 + dx), (3 + dy + height, 3 + dx + width))
        for dy, dx in CIRCLE
    ]
    shifted = jnp.stack(views, axis=0)
    diff = shifted - img[None]

    def arc_score(margin):
        mins = margin
        rolled = margin
        for _ in range(_ARC - 1):
            rolled = jnp.roll(rolled, -1, axis=0)
            mins = jnp.minimum(mins, rolled)
        return jnp.max(mins, axis=0)

    score = jnp.maximum(arc_score(diff), arc_score(-diff))
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    interior = (ys >= 3) & (ys < height - 3) & (xs >= 3) & (xs < width - 3)
    hi_out[:] = jnp.where((score > th_hi) & interior, score, 0.0)
    lo_out[:] = jnp.where((score > th_lo) & interior, score, 0.0)


@functools.partial(
    jax.jit, static_argnames=("th_hi", "th_lo", "interpret")
)
def fast_score_pallas(img, th_hi: float, th_lo: float, interpret: bool = False):
    """(H,W) float32 image -> (score_hi, score_lo) maps, one VMEM pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img.shape
    kernel = functools.partial(
        _fast_kernel, th_hi=th_hi, th_lo=th_lo, height=h, width=w
    )
    out_shape = jax.ShapeDtypeStruct((h, w), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(img.astype(jnp.float32))
