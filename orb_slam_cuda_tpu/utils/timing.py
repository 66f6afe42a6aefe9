"""Per-stage timing instrumentation in the reference's CSV schema.

Replaces the reference's RAII `GetTime` scope timer + CSV flush
(reference: include/ORBextractor.h:49-60, src/ORBextractor.cc:1876-1904,
flushes at src/ORBextractor.cc:804-819, src/Tracking.cc:168-195,
src/LocalMapping.cc:40-55): records are `(frame, name, level, ns)` rows
written to times.csv / timesTracking.csv / timesMapping.csv so existing
analysis tooling for the reference's output keeps working.

On-device async dispatch means a naive timer measures only dispatch cost;
`stage(..., sync=obj)` calls `block_until_ready` on the given array tree
before stopping the clock (the jax.profiler is the microscope; this is
the always-on flight recorder).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class StageTimer:
    """Accumulates (frame, name, level, ns) rows, one logical CSV per
    subsystem, mirroring the reference's times_t records."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.rows: Dict[str, List[tuple]] = defaultdict(list)
        self.frame = 0

    def set_frame(self, frame: int):
        self.frame = frame

    @contextlib.contextmanager
    def stage(self, csv: str, name: str, level: int = -1, sync=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter_ns()
        try:
            yield
        finally:
            if sync is not None:
                try:
                    import jax

                    jax.block_until_ready(sync)
                except Exception:
                    pass
            t1 = time.perf_counter_ns()
            self.rows[csv].append((self.frame, name, level, t1 - t0))

    def summary(self, csv: str) -> Dict[str, float]:
        """Mean milliseconds per stage name (the reference prints
        'Avg computed frame ORB: .. ms' at shutdown, ORBextractor.cc:802)."""
        acc: Dict[str, List[int]] = defaultdict(list)
        for frame, name, level, ns in self.rows.get(csv, []):
            acc[name].append(ns)
        return {k: sum(v) / len(v) / 1e6 for k, v in acc.items() if v}

    def flush(self, directory: str = "."):
        """Write one CSV per subsystem in the reference's format:
        `frame,name,level,time` (ns)."""
        import os

        paths = []
        for csv, rows in self.rows.items():
            path = os.path.join(directory, csv)
            with open(path, "w") as f:
                f.write("frame,name,level,time\n")
                for frame, name, level, ns in rows:
                    f.write(f"{frame},{name},{level},{ns}\n")
            paths.append(path)
        return paths
