#!/usr/bin/env python3
"""Benchmark: H1 standing-balance MPC, iLQR solve wall-time per step.

Prints ONE JSON line:
    {"metric": "ilqr_solve_ms_per_mpc_step", "value": <ms>, "unit": "ms",
     "vs_baseline": <speedup factor vs the 2472.8 ms C++ reference>}

Baseline: the reference's profiled average MPC step time on one CPU core
(README.md:203, BASELINE.md) — 2472.80 ms for the same problem size
(nx=51, nu=19, N=25, dt=0.02). vs_baseline > 1 means faster than reference.

Runs on whatever jax.devices()[0] is (the real TPU chip under the driver).
"""
import json
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
)

REFERENCE_MS = 2472.80  # avg MPC step, 1 CPU core (reference README.md:203)


def main():
    import functools

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller, runner

    root = os.path.dirname(os.path.abspath(__file__))
    app = load_config(os.path.join(root, "config.yaml"))
    # Standing-balance benchmark config (reference README sample run).
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"

    prob = runner.setup(app)
    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs

    N_STEPS = 15  # the reference's profiled standing run length

    run = jax.jit(
        functools.partial(controller.run_closed_loop, model, cp, cfg, plan=prob.plan),
        static_argnames=("n_steps",),
    )

    x = standing_state(model)
    state = controller.init_state(model, cfg)

    # Warm-up / compile (excluded from timing).
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(refs, state, x, n_steps=N_STEPS))
    compile_s = time.perf_counter() - t0

    # Timed: the whole closed-loop plan-act simulation on device (controller
    # + plant fused in one program), averaged per MPC step — the same
    # quantity as the reference's avg MPC_stepOnce (README.md:203), without
    # a host round-trip per step. Each rep perturbs x0 by a physically
    # irrelevant epsilon: the remote execution layer dedupes byte-identical
    # repeat invocations, which would otherwise fake ~0 ms timings.
    reps = 3
    rep_ms = []
    for i in range(reps):
        x_i = x.at[2].add(1e-6 * (i + 1))
        t0 = time.perf_counter()
        state_f, x_f, hist = jax.block_until_ready(run(refs, state, x_i, n_steps=N_STEPS))
        rep_ms.append((time.perf_counter() - t0) * 1e3)

    costs = np.asarray(hist["cost"])
    steady = [ms / N_STEPS for ms in rep_ms]
    x = x_f
    value = float(np.mean(steady))
    result = {
        "metric": "ilqr_solve_ms_per_mpc_step",
        "value": round(value, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_MS / value, 2),
    }
    # Context to stderr; the single JSON line to stdout.
    print(
        f"# device={jax.devices()[0]} compile={compile_s:.1f}s "
        f"min={min(steady):.2f} max={max(steady):.2f} cost0={costs[0]:.2f} "
        f"costN={costs[-1]:.2f} base_z={float(x[2]):.3f}",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
