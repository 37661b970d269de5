#!/usr/bin/env python3
"""Benchmark: H1 standing-balance MPC, iLQR solve wall-time per step.

Prints ONE JSON line:
    {"metric": "ilqr_solve_ms_per_mpc_step", "value": <ms>, "unit": "ms",
     "vs_baseline": <speedup factor vs the 2472.8 ms C++ reference>}

Baseline: the reference's profiled average MPC step time on one CPU core
(README.md:203, BASELINE.md) — 2472.80 ms for the same problem size
(nx=51, nu=19, N=25, dt=0.02). vs_baseline > 1 means faster than reference.

Cold-start contract (VERDICT r2 item 1): a number must land from a cold
process inside the driver's window even if the compile cache misses. The
flagship config (pallas rollout kernels + cascade line search) is attempted
in a SUBPROCESS with a hard wall-clock budget; if its compile does not
finish in time (a fresh Mosaic+fused-loop graph takes 10-25 min through the
remote compile service), the parent falls back to the XLA-backend config,
whose graph compiles in ~1 min (r1's driver-verified path, BENCH_r01.json).
Both graphs are kept warm in .jax_cache by tools/warm_cache.py.

Usage:
    python bench.py                 # orchestrated: flagship w/ budget, fallback
    python bench.py --inner NAME    # run one config inline (no subprocess)
Env:
    BENCH_FLAGSHIP_BUDGET_S  wall budget for the flagship attempt (default 420)
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
REFERENCE_MS = 2472.80  # avg MPC step, 1 CPU core (reference README.md:203)
N_STEPS = 15  # the reference's profiled standing run length

# Engine-config overrides per bench config. "flagship" is the shipped
# config.yaml default (no overrides). "fallback" pins the pure-XLA path —
# same solver semantics (cascade == first_accept selection), no Mosaic
# kernels, small graph, fast compile.
CONFIGS = {
    "flagship": {},
    "fallback": {
        "rollout_backend": "xla",
        "ls_backend": "xla",
        "line_search": "first_accept",
    },
}


def run_inner(name: str) -> None:
    """Run one bench config inline and print the JSON result line."""
    import functools

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

    import dataclasses

    import numpy as np

    sys.path.insert(0, ROOT)
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller, runner

    app = load_config(os.path.join(ROOT, "config.yaml"))
    # Standing-balance benchmark config (reference README sample run).
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    overrides = CONFIGS[name]
    for k, v in overrides.items():
        app.engine[k] = v

    prob = runner.setup(app)
    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs

    x = standing_state(model)
    state = controller.init_state(model, cfg)

    # AOT fast path (VERDICT r3 weak 4): deserialize the pre-compiled
    # executable from artifacts/aot/bench_<name>.jaxexec (seconds) instead
    # of the 10-25 min remote compile; on fingerprint mismatch (any source/
    # config/jax/device change) fall back to jit AND refresh the artifact.
    from mpc_ilqr_tpu.utils import aot

    fn = functools.partial(controller.run_closed_loop, model, cp, cfg, plan=prob.plan)
    run_c, used_aot, compile_s = aot.jit_or_aot(
        f"bench_{name}", fn, (refs, state, x),
        static_argnames=("n_steps",), n_steps=N_STEPS,
    )
    run = lambda r, s, xx, n_steps=None: run_c(r, s, xx)  # noqa: E731

    # Warm-up (excluded from timing): compile already accounted above for
    # the cold path; for the AOT path this is deserialize+first-exec.
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(refs, state, x, n_steps=N_STEPS))
    compile_s += time.perf_counter() - t0

    # Timed: the whole closed-loop plan-act simulation on device (controller
    # + plant fused in one program), averaged per MPC step — the same
    # quantity as the reference's avg MPC_stepOnce (README.md:203), without
    # a host round-trip per step. Each rep perturbs x0 by a physically
    # irrelevant epsilon SALTED with per-process randomness: the remote
    # execution layer dedupes byte-identical invocations — and its cache
    # outlives the process, so a deterministic 1e-6*(i+1) perturbation
    # replays a PREVIOUS run's results at ~0 ms (observed: an N=100 config
    # "timing" 0.21 ms/step after an earlier session ran the same graph on
    # the same inputs).
    salt = float(np.random.default_rng().uniform(0.5, 1.5)) * 1e-6
    reps = 3
    rep_ms = []
    for i in range(reps):
        x_i = x.at[2].add(salt * (i + 1))
        t0 = time.perf_counter()
        state_f, x_f, hist = jax.block_until_ready(run(refs, state, x_i, n_steps=N_STEPS))
        rep_ms.append((time.perf_counter() - t0) * 1e3)

    costs = np.asarray(hist["cost"])
    steady = [ms / N_STEPS for ms in rep_ms]
    value = float(np.mean(steady))
    result = {
        "metric": "ilqr_solve_ms_per_mpc_step",
        "value": round(value, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_MS / value, 2),
    }
    # Context to stderr; the single JSON line to stdout.
    print(
        f"# config={name} device={jax.devices()[0]} aot={used_aot} "
        f"compile={compile_s:.1f}s "
        f"min={min(steady):.2f} max={max(steady):.2f} cost0={costs[0]:.2f} "
        f"costN={costs[-1]:.2f} base_z={float(x_f[2]):.3f}",
        file=sys.stderr,
    )
    print(json.dumps(result), flush=True)


def _attempt(name: str, budget_s: float):
    """Run one config in a subprocess with a wall-clock budget.

    Returns the parsed result dict, or None on timeout/failure."""
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", name],
            capture_output=True,
            text=True,
            timeout=budget_s,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        print(
            f"# {name}: no result within {budget_s:.0f}s budget (compile-cache "
            f"miss on the fused Mosaic graph) — falling back",
            file=sys.stderr,
        )
        return None
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"# {name}: rc={proc.returncode}", file=sys.stderr)
        return None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    print(f"# {name}: produced no JSON line ({time.perf_counter()-t0:.0f}s)", file=sys.stderr)
    return None


def _wait_for_tpu(max_wait_s: float) -> bool:
    """Bounded wait for the axon tunnel (it has gone down for hours at a
    time, r3): probe device init in a subprocess, retrying up to max_wait_s.
    Returns True once a TPU answers; False if the budget runs out (the
    attempts proceed anyway so their own error text lands in stderr)."""
    t0 = time.perf_counter()
    while True:
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); assert d[0].platform=='tpu'"],
                capture_output=True, timeout=240, cwd=ROOT,
            )
            if probe.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        waited = time.perf_counter() - t0
        if waited >= max_wait_s:
            print(f"# TPU tunnel unreachable after {waited:.0f}s — proceeding",
                  file=sys.stderr)
            return False
        print(f"# TPU tunnel down ({waited:.0f}s) — retrying", file=sys.stderr)
        time.sleep(min(60.0, max_wait_s - waited))


# Driver-artifact extras (VERDICT r3 item 4): after the guaranteed standing
# headline, emit one JSON line per remaining BASELINE.md config. Each runs
# tools/bench_suite.py in a subprocess under its own wall budget with the
# AOT executables enabled, so a warm-artifact pass adds only seconds per
# metric; a cold one is dropped when its budget expires — the headline can
# never be starved. Matches the reference's multi-row profile table
# (/root/reference/README.md:196-212).
EXTRAS = [
    # Ordered so the two BASELINE configs that were evicted from BENCH_r04
    # by compile-budget exhaustion (fleet, linesearch — VERDICT r4 missing 1)
    # run FIRST: if anything gets dropped it is a config that already has a
    # driver-artifact row, never one that doesn't.
    ("fleet", ["--config", "fleet", "--fleet", "1024", "--chunk", "128",
               "--fleet-linevery", "2", "--aot"]),
    ("linesearch", ["--config", "linesearch", "--aot"]),
    ("walking", ["--config", "walking", "--steps", "15", "--aot"]),
    ("long_horizon", ["--config", "long_horizon", "--lh-tuned", "--aot"]),
    # The 100 Hz deployment answer: 1 warm iteration per solve, TV-LQR
    # tracking on the off steps (equal final cost to the 2-it loop;
    # 16.2 ms/step measured r4 vs 33.2 for the every-step loop).
    ("long_horizon_amortized",
     ["--config", "long_horizon", "--lh-tuned", "--lh-iters", "1",
      "--lh-solve-every", "2", "--aot"]),
]


def _run_extra(label: str, argv: list, budget_s: float) -> None:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "bench_suite.py"), *argv],
            capture_output=True, text=True, timeout=budget_s, cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        print(f"# extra {label}: no result within {budget_s:.0f}s — skipped",
              file=sys.stderr)
        return
    sys.stderr.write(proc.stderr)
    emitted = False
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            print(line, flush=True)
            emitted = True
    if not emitted:
        print(f"# extra {label}: rc={proc.returncode}, no JSON line", file=sys.stderr)


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--inner":
        run_inner(sys.argv[2])
        return

    t_start = time.perf_counter()
    _wait_for_tpu(float(os.environ.get("BENCH_TPU_WAIT_S", "600")))

    # Measured (r3): a fully-cold flagship run lands in ~10.5 min; with the
    # AOT artifact valid it lands in well under a minute. The driver's
    # window is ~30 min. 15 min leaves the fallback (~2-4 min compile)
    # comfortable room either way.
    budget = float(os.environ.get("BENCH_FLAGSHIP_BUDGET_S", "900"))
    result = _attempt("flagship", budget)
    if result is None:
        # The fallback graph is small (no Mosaic kernels, first_accept):
        # ~1 min to compile from scratch, seconds on a cache hit.
        result = _attempt("fallback", max(budget, 600.0))
    if result is None:
        # Never exit silent: emit a sentinel so the driver records *something*.
        result = {
            "metric": "ilqr_solve_ms_per_mpc_step",
            "value": -1.0,
            "unit": "ms",
            "vs_baseline": 0.0,
        }
    print(json.dumps(result), flush=True)

    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "1680"))
    extra_budget = float(os.environ.get("BENCH_EXTRA_BUDGET_S", "420"))
    if os.environ.get("BENCH_EXTRAS", "1") != "1":
        return
    for label, argv in EXTRAS:
        remaining = total_budget - (time.perf_counter() - t_start)
        if remaining < 60.0:
            print(f"# extras stopped: {remaining:.0f}s left of the "
                  f"{total_budget:.0f}s total budget", file=sys.stderr)
            break
        _run_extra(label, argv, min(extra_budget, remaining))


if __name__ == "__main__":
    main()
