"""Device-mesh helpers for the distributed back-end.

The reference is single-process/single-GPU (SURVEY.md §2.3: no
distributed communication backend — its only IPC is a `system()` exec of
pba_driver); the distributed layer here is the new capability required by
BASELINE.json: map/observation blocks sharded over a `jax.sharding.Mesh`,
with XLA inserting the `psum`/`all_gather` collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all).

    The observation axis is the natural shard dimension for bundle
    adjustment (every per-edge computation is independent; the normal
    equations reduce over it), matching PBA's per-projection CUDA
    parallelism (reference Thirdparty/pba/src/pba/ProgramCU.cu:685-2556)
    lifted across chips.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
