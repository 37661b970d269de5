"""Named-stage wall-clock profiler reproducing the reference's taxonomy.

The reference brackets stages with steady_clock pushes into a global map and
prints a Calls/Total/Avg/Min/Max table at exit (humanoid_mpc.cpp:22-49,
195-226). Here: a context-manager timer that blocks on device results, plus
RSS tracking from /proc/self/status like the reference's memory profiler.

Stage names preserved so profiling output is comparable:
MPC_stepOnce, MPC_extractReference, MPC_warmStart, MPC_iLQR_solve,
MPC_computeControl, iLQR_forwardRollout, iLQR_linearization,
iLQR_costQuadratics, iLQR_backwardPass, iLQR_lineSearch, iLQR_computeCost.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


def _rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


class Profiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: Dict[str, List[float]] = defaultdict(list)
        self.mem_initial = _rss_mb()
        self.mem_peak = self.mem_initial

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        """Time a stage; pass the stage's output pytree via `block_on` (or
        call .block(out) inside) so async dispatch doesn't lie."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.times[name].append((time.perf_counter() - t0) * 1e3)
        self.mem_peak = max(self.mem_peak, _rss_mb())

    def record(self, name: str, ms: float):
        self.times[name].append(ms)

    def time_fn(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        out = jax.block_until_ready(out)
        self.times[name].append((time.perf_counter() - t0) * 1e3)
        self.mem_peak = max(self.mem_peak, _rss_mb())
        return out

    def report(self) -> str:
        lines = ["", "=== Performance Profiling ===", "", "--- Timing Summary ---"]
        lines.append(
            f"{'Function':<22}{'Calls':>8}{'Total(ms)':>12}{'Avg(ms)':>12}{'Min(ms)':>12}{'Max(ms)':>12}"
        )
        lines.append("-" * 78)
        for name in sorted(self.times):
            ts = self.times[name]
            lines.append(
                f"{name:<22}{len(ts):>8}{sum(ts):>12.2f}{sum(ts)/len(ts):>12.2f}"
                f"{min(ts):>12.2f}{max(ts):>12.2f}"
            )
        mem_final = _rss_mb()
        lines += [
            "",
            "--- Memory Summary ---",
            f"Initial:  {self.mem_initial:.2f} MB",
            f"Peak:     {self.mem_peak:.2f} MB",
            f"Final:    {mem_final:.2f} MB",
            "==========================",
        ]
        return "\n".join(lines)
