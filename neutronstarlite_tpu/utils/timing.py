"""Per-phase wall-clock timing, the reference's DEBUGINFO equivalent.

Ref: the Graph's 13 accumulator doubles (core/graph.hpp:210-222) and the
per-model DEBUGINFO() phase breakdown (toolkits/GCN.hpp:308-353). Here a
single structured timer; `jax.profiler` traces cover the on-device view.
"""

from __future__ import annotations

import collections
import contextlib
import time


class PhaseTimer:
    """Accumulates wall-clock seconds per named phase across epochs."""

    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_s": v / max(self.counts[k], 1)}
                for k, v in sorted(self.totals.items())}

    def print_report(self) -> None:
        for name, r in self.report().items():
            print(f"{name:30s} total {r['total_s']:8.3f}s  "
                  f"x{r['count']:<5d} mean {r['mean_s']*1e3:8.2f}ms")
