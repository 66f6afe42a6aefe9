"""Multi-host initialization and sharding helpers.

The BASELINE.json north star shards keyframe/map blocks across a
multi-host slice: local (covisibility-cluster) BA stays host-local while
global BA and pose-graph solves reduce over ICI (`parallel/dist_ba.py`),
with DCN used only for dataset sharding. This module provides the
process-group bootstrap and the cluster-assignment utility; the actual
collectives are inserted by XLA from the shardings (see dist_ba.py).

Multi-host hardware is not available in CI; the mesh/sharding path is
exercised on a virtual 8-device CPU mesh (tests/test_parallel.py) and via
the driver's dryrun (`__graft_entry__.dryrun_multichip`).
"""

from __future__ import annotations

import numpy as np


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """jax.distributed bootstrap (no-op when single-process).

    Mirrors the scaling-book recipe: call once per host before building
    meshes; afterwards jax.devices() spans the slice and Mesh axes can
    cross hosts.
    """
    import jax

    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def covisibility_clusters(covis: np.ndarray, kf_valid: np.ndarray,
                          n_clusters: int) -> np.ndarray:
    """Partition keyframes into `n_clusters` balanced clusters that keep
    covisibility-heavy pairs together — the host-local working sets for
    distributed local BA (the reference's locality structure: local BA
    windows are covisibility neighborhoods, src/Optimizer.cc:550-611).

    Greedy modularity-ish agglomeration (host-side, runs at rebalance
    cadence, not per frame). Returns (K,) int32 cluster id, -1 for
    invalid keyframes.
    """
    K = covis.shape[0]
    valid = np.flatnonzero(kf_valid)
    assign = np.full(K, -1, np.int64)
    if len(valid) == 0:
        return assign.astype(np.int32)
    order = sorted(valid.tolist())
    target = int(np.ceil(len(valid) / n_clusters))
    cluster_of = {}
    sizes = [0] * n_clusters
    # Seed clusters by contiguous keyframe order (temporal locality ==
    # covisibility locality for SLAM trajectories), then refine by moving
    # boundary keyframes toward their heaviest-linked cluster.
    for i, k in enumerate(order):
        c = min(i // target, n_clusters - 1)
        cluster_of[k] = c
        sizes[c] += 1
    for _ in range(3):
        for k in order:
            weights = np.zeros(n_clusters)
            for j in valid:
                if j != k and covis[k, j] > 0:
                    weights[cluster_of[j]] += covis[k, j]
            best = int(np.argmax(weights))
            cur = cluster_of[k]
            if (
                weights[best] > weights[cur] * 1.2
                and sizes[best] < target + 2
                and sizes[cur] > 1
            ):
                sizes[cur] -= 1
                sizes[best] += 1
                cluster_of[k] = best
    for k, c in cluster_of.items():
        assign[k] = c
    return assign.astype(np.int32)
