"""Per-frame working set: the array-form `Frame`.

Replaces the reference's `Frame` class (reference: src/Frame.cc): feature
arrays from the extractor + undistortion + vocabulary transform + the
per-feature map-point binding vector (the reference's mvpMapPoints).
The 64x48 feature grid (`AssignFeaturesToGrid`, src/Frame.cc:229-244) has
no equivalent here — dense masked matching replaces grid lookups
(see matching/core.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..frontend.extractor import Features
from ..geometry import camera as cam_mod
from ..ops import hamming


class FrameData(NamedTuple):
    """Fixed-capacity (N,) feature arrays for one frame."""

    uv: jnp.ndarray  # (N,2) undistorted level-0 coords (mvKeysUn)
    uv_raw: jnp.ndarray  # (N,2) raw image coords (mvKeys)
    oct: jnp.ndarray  # (N,) int32
    ang: jnp.ndarray  # (N,) float32 degrees
    response: jnp.ndarray  # (N,)
    desc: jnp.ndarray  # (N,8) uint32
    bip: jnp.ndarray  # (N,256) bf16 bipolar
    valid: jnp.ndarray  # (N,) bool
    word: jnp.ndarray  # (N,) int32 vocab leaf
    node: jnp.ndarray  # (N,) int32 levelsup node
    idf: jnp.ndarray  # (N,) f32 word idf weight
    right: jnp.ndarray  # (N,) f32 stereo right-u (<0 mono)
    depth: jnp.ndarray  # (N,) f32 (<0 unknown)
    mp: jnp.ndarray  # (N,) int32 bound map point (-1 none)

    @property
    def capacity(self):
        return self.uv.shape[0]


def build_frame(
    feats: Features,
    cam: cam_mod.Camera,
    vocab=None,
    right=None,
    depth=None,
) -> FrameData:
    """Assemble a FrameData from extractor output (undistort + BoW).

    The vocabulary transform mirrors Frame::ComputeBoW
    (reference src/Frame.cc:388-399); undistortion mirrors
    UndistortKeyPoints (:401+).
    """
    n = feats.capacity
    uv_und = cam_mod.undistort_points(cam, feats.uv)
    bip = hamming.bipolar(feats.desc)
    if vocab is not None:
        word, node, idf = vocab.transform(feats.desc)  # packed descent
        word = jnp.where(feats.valid, word, -1)
        node = jnp.where(feats.valid, node, -1)
    else:
        word = jnp.full((n,), -1, jnp.int32)
        node = jnp.full((n,), -1, jnp.int32)
        idf = jnp.zeros((n,), jnp.float32)
    return FrameData(
        uv=uv_und,
        uv_raw=feats.uv,
        oct=feats.octave,
        ang=feats.angle,
        response=feats.response,
        desc=feats.desc,
        bip=bip,
        valid=feats.valid,
        word=word,
        node=node,
        idf=idf,
        right=jnp.full((n,), -1.0, jnp.float32) if right is None else right,
        depth=jnp.full((n,), -1.0, jnp.float32) if depth is None else depth,
        mp=jnp.full((n,), -1, jnp.int32),
    )
