#!/usr/bin/env python3
"""Warm the persistent XLA compile cache for every driver-facing graph.

The driver runs bench.py and __graft_entry__ from a COLD process at the end
of each round; a fresh fused-loop Mosaic graph takes 10-25 minutes through
the remote compile service (BENCH_r02.json died this way, rc=124). Running
this script after the last solver/config change guarantees the exact final
graphs are in .jax_cache, so the driver's run is a cache hit (~1-2 min).

Each target runs in its own subprocess (mirroring how the driver invokes
them — same cache keys), sequentially:
  1. bench.py --inner flagship     (shipped config.yaml: pallas + cascade)
  2. bench.py --inner fallback     (pure-XLA safety-net config)
  3. __graft_entry__.entry()       (single-chip compile check)

Usage: python tools/warm_cache.py [--skip fallback,entry]
"""
import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

TARGETS = {
    "flagship": [sys.executable, "bench.py", "--inner", "flagship"],
    "fallback": [sys.executable, "bench.py", "--inner", "fallback"],
    "entry": [
        sys.executable,
        "-c",
        "import __graft_entry__ as g, jax; fn, args = g.entry(); "
        "jax.block_until_ready(jax.jit(fn)(*args)); print('entry ok')",
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma-separated target names")
    ap.add_argument("--timeout", type=float, default=2400.0)
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    failures = []
    for name, cmd in TARGETS.items():
        if name in skip:
            continue
        t0 = time.perf_counter()
        print(f"--- warming {name} ---", flush=True)
        proc = subprocess.run(cmd, cwd=ROOT, timeout=args.timeout)
        dt = time.perf_counter() - t0
        status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
        print(f"--- {name}: {status} in {dt:.0f}s ---", flush=True)
        if proc.returncode != 0:
            failures.append(name)
    if failures:
        sys.exit(f"warm_cache failures: {failures}")


if __name__ == "__main__":
    main()
