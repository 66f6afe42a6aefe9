"""ctypes bridge to the native ORBvoc.txt parser (native/vocab_loader.cpp).

The text parse of the stock ~1M-word vocabulary dominates the reference's
startup (SURVEY.md §3.1: TemplatedVocabulary.h:241 '~1M-word text parse;
SLOW startup'); the native scanner is ~20-50x faster than the Python
line loop. Falls back transparently to the pure-Python parser when the
shared library hasn't been built (native/build.sh).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "lib",
                 "libvocab_loader.so"),
]


class _VocabData(ctypes.Structure):
    _fields_ = [
        ("k", ctypes.c_int32),
        ("depth", ctypes.c_int32),
        ("n_nodes", ctypes.c_int64),
        ("parents", ctypes.POINTER(ctypes.c_int32)),
        ("is_leaf", ctypes.POINTER(ctypes.c_uint8)),
        ("desc", ctypes.POINTER(ctypes.c_uint8)),
        ("weights", ctypes.POINTER(ctypes.c_double)),
    ]


def _load_lib():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.vocab_load.restype = ctypes.POINTER(_VocabData)
            lib.vocab_load.argtypes = [ctypes.c_char_p]
            lib.vocab_free.argtypes = [ctypes.POINTER(_VocabData)]
            return lib
    return None


_lib = _load_lib()


def available() -> bool:
    return _lib is not None


def parse_orbvoc_text(path: str):
    """-> (k, depth, parents (n,), is_leaf (n,), desc_bytes (n,32),
    weights (n,)) as numpy arrays, via the native scanner."""
    if _lib is None:
        raise RuntimeError(
            "native vocab loader not built; run native/build.sh"
        )
    ptr = _lib.vocab_load(path.encode())
    if not ptr:
        raise IOError(f"native vocab parse failed for {path!r}")
    v = ptr.contents
    n = v.n_nodes
    try:
        parents = np.ctypeslib.as_array(v.parents, (n,)).copy()
        is_leaf = np.ctypeslib.as_array(v.is_leaf, (n,)).copy().astype(bool)
        desc = np.ctypeslib.as_array(v.desc, (n, 32)).copy()
        weights = np.ctypeslib.as_array(v.weights, (n,)).copy()
        k, depth = int(v.k), int(v.depth)
    finally:
        _lib.vocab_free(ptr)
    return k, depth, parents, is_leaf, desc, weights
