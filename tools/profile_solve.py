#!/usr/bin/env python3
"""Per-stage solver profiling with the reference's timing taxonomy.

Times each iLQR stage as a separately-jitted function (block_until_ready
between stages) and prints the Calls/Total/Avg/Min/Max table the reference's
ENABLE_PROFILING build produces (humanoid_mpc.cpp:195-226), plus the
iteration count distribution of full closed-loop solves.

Usage: python tools/profile_solve.py [--cpu] [--steps 10] [--reps 10]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mpc_ilqr_tpu.costs.quadratics import quadraticize, trajectory_cost
    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.costs.references import extract_window
    from mpc_ilqr_tpu.ilqr import solver as ilqr
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller, runner
    from mpc_ilqr_tpu.utils.profiling import Profiler

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    app = load_config(os.path.join(root, "config.yaml"))
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    prob = runner.setup(app)
    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs
    print(f"device: {jax.devices()[0]}, N={cfg.N}", flush=True)

    x0 = standing_state(model)
    win = extract_window(refs, jnp.zeros((), jnp.int32), cfg.N)
    u_grav = engine.gravity_comp(model, x0)
    ubar = jnp.tile(u_grav[None], (cfg.N, 1))

    # Separately-jitted stages
    j_rollout = jax.jit(lambda u: ilqr.rollout(model, cfg, x0, u))
    j_lin = jax.jit(lambda xs, us: ilqr.linearize(model, cfg, xs, us))
    j_quad = jax.jit(lambda xs, us: quadraticize(model, cp, win, xs, us))
    j_back = jax.jit(lambda A, B, q, r: ilqr.backward_pass(A, B, q, r, cfg.pd_bump))
    j_cost = jax.jit(lambda xs, us: trajectory_cost(model, cp, win, xs, us, cfg.cost_mode))
    j_ls = jax.jit(
        lambda xs, us, K, kff, base: ilqr.line_search(
            model, cp, cfg, win, x0, xs, us, K, kff, base
        )
    )

    prof = Profiler()
    xbar = j_rollout(ubar)
    A, B = j_lin(xbar, ubar)
    quad = j_quad(xbar, ubar)
    K, kff = j_back(A, B, quad, jnp.asarray(1e-6, xbar.dtype))
    base = j_cost(xbar, ubar)
    _ = j_ls(xbar, ubar, K, kff, base)  # compile all

    for _ in range(args.reps):
        xbar = prof.time_fn("iLQR_forwardRollout", j_rollout, ubar)
        A, B = prof.time_fn("iLQR_linearization", j_lin, xbar, ubar)
        quad = prof.time_fn("iLQR_costQuadratics", j_quad, xbar, ubar)
        K, kff = prof.time_fn("iLQR_backwardPass", j_back, A, B, quad, jnp.asarray(1e-6, xbar.dtype))
        base = prof.time_fn("iLQR_computeCost", j_cost, xbar, ubar)
        _ = prof.time_fn("iLQR_lineSearch", j_ls, xbar, ubar, K, kff, base)

    # Closed-loop iteration counts
    step_once = jax.jit(functools.partial(controller.step_once, model, cp, cfg))
    plant = jax.jit(lambda xx, uu: engine.step(model, xx, uu))
    state = controller.init_state(model, cfg)
    x = x0
    iters = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, u, diag = jax.block_until_ready(step_once(refs, state, x))
        prof.record("MPC_stepOnce", (time.perf_counter() - t0) * 1e3)
        iters.append(int(diag.iterations))
        x = plant(x, u)

    print(prof.report())
    print(f"\niLQR iterations per solve: {iters}")


if __name__ == "__main__":
    main()
