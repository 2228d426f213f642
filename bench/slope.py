"""Shared calibrated slope timing for the on-chip probes.

2026-08-20 finding (BASELINE round-4 notes): `(T(2k) - T(k)) / k` only
measures per-call time when the difference signal dominates the
+-5-30 ms per-region sync jitter — fixed small k silently published
negative or inflated numbers for cheap calls (polar SC, QC kernel,
coded link). This helper sizes k from a DIFFERENCED burst estimate
(single-region estimates over-read ~10x for cheap calls: they carry the
fixed sync) and reports unresolved runs instead of garbage.
"""

from __future__ import annotations

import statistics
from typing import Callable


def calibrated_slope(region: Callable[[int], float], trials: int = 5,
                     target_s: float = 0.08, kmax: int = 384,
                     kmin: int = 4):
    """region(k) runs k calls and returns wall seconds (ending in a
    forced fetch). Returns (median_slope_s, k) or (None, k) when the
    signal stayed below the jitter floor at kmax."""
    import numpy as np

    region(1)                                  # warm-up
    est = max((region(16) - region(8)) / 8.0, 1e-5)
    k = int(min(kmax, max(kmin, np.ceil(target_s / est))))
    slopes = []
    for _ in range(trials):
        t1 = region(k)
        t2 = region(2 * k)
        slopes.append((t2 - t1) / k)
    med = float(statistics.median(slopes))
    if med <= 0 or med * k < 0.02:
        return None, k
    return med, k
