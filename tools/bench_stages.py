#!/usr/bin/env python3
"""On-device per-stage timing via fused repetition loops.

The axon tunnel adds ~28 ms per dispatch, so timing separately-dispatched
stages (tools/profile_solve.py, the reference's taxonomy) measures only the
tunnel. Here each stage runs REPS times inside one jitted lax.scan with a
perturbed input per rep (the remote layer dedupes byte-identical calls), so
  stage_ms = (t_loop - t_dispatch_floor) / REPS
isolates device compute. Complements, not replaces, profile_solve.py.

Usage: python tools/bench_stages.py [--cpu] [--reps 50] [--config standing]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--config", default="standing",
                    choices=["standing", "walking", "long_horizon"])
    ap.add_argument("--lin", default=None,
                    choices=["ad", "ad_frozen_mass", "fd",
                             "structured", "structured_frozen_mass"],
                    help="override engine.linearization for the stage timings")
    ap.add_argument("--quad", default=None, choices=["exact", "gn"],
                    help="override engine.quad_mode")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mpc_ilqr_tpu.costs.quadratics import quadraticize, trajectory_cost
    from mpc_ilqr_tpu.costs.references import extract_window
    from mpc_ilqr_tpu.ilqr import solver as ilqr
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller, runner

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    app = load_config(os.path.join(root, "config.yaml"))
    if args.config in ("standing", "long_horizon"):
        app.q_ref_path = "data/q_standing.csv"
        app.v_ref_path = "data/v_standing.csv"
        app.contact_schedule_path = "data/contact_standing.csv"
    if args.config == "long_horizon":
        # BASELINE config 4: N=100 @ 100 Hz replanning (VERDICT r3 item 4 —
        # the measured breakdown proving the latency floor).
        app.mpc.dt = 0.01
        app.mpc.physics_dt = 0.01
        app.mpc.horizon = 100
    prob = runner.setup(app)
    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs
    import dataclasses

    if args.lin:
        cfg = dataclasses.replace(cfg, linearization=args.lin)
    if args.quad:
        cfg = dataclasses.replace(cfg, quad_mode=args.quad)
    print(f"device: {jax.devices()[0]}, N={cfg.N}, reps={args.reps}, "
          f"lin={cfg.linearization}, quad={cfg.quad_mode}", flush=True)

    x0 = standing_state(model)
    win = extract_window(refs, jnp.zeros((), jnp.int32), cfg.N)
    from mpc_ilqr_tpu.dynamics import engine

    u_grav = engine.gravity_comp(model, x0)
    ubar = jnp.tile(u_grav[None], (cfg.N, 1))
    xbar = ilqr.rollout(model, cfg, x0, ubar)
    A, B = ilqr.linearize(model, cfg, xbar, ubar)
    quad = quadraticize(model, cp, win, xbar, ubar)
    K, kff = ilqr.backward_pass(A, B, quad, jnp.asarray(1e-6, x0.dtype), cfg.pd_bump)
    base = trajectory_cost(model, cp, win, xbar, ubar, mode=cfg.cost_mode)
    state0 = controller.init_state(model, cfg)

    REPS = args.reps

    def reploop(fn, *inputs):
        """Run fn REPS times in one jitted scan, perturbing x-like input."""

        @jax.jit
        def run(seed):
            def body(acc, k):
                eps = (seed + k.astype(x0.dtype)) * 1e-9
                out = fn(eps, *inputs)
                return acc + out, None

            acc, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), jnp.arange(REPS))
            return acc

        return run

    stages = {}
    stages["dispatch_floor"] = reploop(lambda e: e)
    stages["rollout25"] = reploop(
        lambda e: jnp.sum(ilqr.rollout(model, cfg, x0 + e, ubar)[-1])
    )
    stages["step1"] = reploop(lambda e: jnp.sum(engine.step(model, x0 + e, u_grav)))
    stages["linearize"] = reploop(
        lambda e: jnp.sum(ilqr.linearize(model, cfg, xbar + e, ubar)[0])
    )
    stages["quadraticize"] = reploop(
        lambda e: jnp.sum(quadraticize(model, cp, win, xbar + e, ubar,
                                       hess_mode=cfg.quad_mode).lx)
    )
    stages["cost_eval"] = reploop(
        lambda e: trajectory_cost(model, cp, win, xbar + e, ubar, mode=cfg.cost_mode)
    )
    stages["backward"] = reploop(
        lambda e: jnp.sum(
            ilqr.backward_pass(A + e, B, quad, jnp.asarray(1e-6, x0.dtype), cfg.pd_bump)[0]
        )
    )
    stages["line_search8"] = reploop(
        lambda e: ilqr.line_search(
            model, cp, cfg, win, x0 + e, xbar, ubar, K, kff, base
        )[3]
    )
    stages["solve"] = reploop(
        lambda e: ilqr.solve(model, cp, cfg, x0 + e, win, ubar).cost
    )
    stages["step_once"] = reploop(
        lambda e: controller.step_once(model, cp, cfg, refs, state0, x0 + e)[2].cost
    )

    results = {}
    floor_ms = None
    for name, run in stages.items():
        jax.block_until_ready(run(jnp.asarray(0.0, x0.dtype)))  # compile
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.asarray(float(r + 1), x0.dtype)))
            ts.append((time.perf_counter() - t0) * 1e3)
        total = min(ts)
        if name == "dispatch_floor":
            floor_ms = total
            print(f"{name:16s} total={total:9.2f} ms")
            continue
        per = (total - floor_ms) / REPS
        results[name] = per
        print(f"{name:16s} total={total:9.2f} ms  per-call={per:8.3f} ms")

    print("\nper-solve estimate (1 rollout + it*(lin+quad+back+ls)):")
    for it in (1, 2, 3):
        est = results["rollout25"] + it * (
            results["linearize"]
            + results["quadraticize"]
            + results["backward"]
            + results["line_search8"]
            + results["cost_eval"]
        )
        print(f"  {it} iterations: {est:7.2f} ms   (measured solve: {results['solve']:.2f})")


if __name__ == "__main__":
    main()
