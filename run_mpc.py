#!/usr/bin/env python3
"""Closed-loop H1 MPC driver — the reference's humanoid_mpc executable.

Usage:
    python run_mpc.py [--config config.yaml] [--steps N] [--standing]
                      [--profile] [--quiet]

Reads config.yaml, runs the receding-horizon MPC against the built-in
differentiable physics, writes results/q_optimal.csv + u_optimal.csv and the
per-step log (same headers as the reference), prints the per-step line
`Step k/N | Cost: ... | (X,Y,Z): ...` (humanoid_mpc.cpp:172-178) and, with
--profile, the timing/memory table (humanoid_mpc.cpp:195-226).
"""
import argparse
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(os.path.dirname(__file__), "config.yaml"))
    ap.add_argument("--steps", type=int, default=None, help="override mpc.sim_steps")
    ap.add_argument("--standing", action="store_true",
                    help="use the standing references/contact schedule instead of walking")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--plant", choices=["engine", "mujoco"], default="engine",
                    help="plant physics: the built-in differentiable engine "
                         "(reference-style self-consistent sim) or a real "
                         "MuJoCo simulation (cross-plant validation)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpc_ilqr_tpu.io import logging as iolog
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.mpc import runner
    from mpc_ilqr_tpu.utils.profiling import Profiler

    app = load_config(args.config)
    if args.standing:
        app.q_ref_path = "data/q_standing.csv"
        app.v_ref_path = "data/v_standing.csv"
        app.contact_schedule_path = "data/contact_standing.csv"
    print(f"Configuration loaded from {args.config}")

    prob = runner.setup(app)
    model = prob.model
    print(f"Model loaded: nx={model.nx}, nu={model.nu} | horizon N={prob.cfg.N} "
          f"dt={app.mpc.dt} | references: {prob.refs.length} rows | device: {jax.devices()[0]}")

    prof = Profiler(enabled=True)

    import time

    if args.plant == "mujoco":
        from mpc_ilqr_tpu.mpc.mujoco_plant import run_mujoco_in_the_loop

        steps = args.steps if args.steps is not None else app.mpc.sim_steps
        t0 = time.perf_counter()
        hist = run_mujoco_in_the_loop(prob, steps, verbose=not args.quiet)
        wall = (time.perf_counter() - t0) * 1e3
        print(f"MuJoCo-plant simulation completed in {wall:.0f} ms "
              f"({wall / max(1, steps):.1f} ms/step); final base z "
              f"{hist['x'][-1][2]:.4f}, final cost {hist['cost'][-1]:.4f}")
        if args.profile:
            print(prof.report())
        return

    step_logger = iolog.StepLogger(
        os.path.join(app.resolve(app.logs_dir), "mpc_log.csv"), model.nx, model.nu
    )
    traj_logger = (
        iolog.OptimalTrajectoryLogger(app.resolve(app.results_path), model.nq, model.nu)
        if app.save_trajectories
        else None
    )

    t0 = time.perf_counter()
    hist, _ = runner.run_simulation(
        prob,
        sim_steps=args.steps,
        verbose=not args.quiet,
        profiler=prof,
        step_logger=step_logger,
        traj_logger=traj_logger,
    )
    wall = (time.perf_counter() - t0) * 1e3
    n = max(1, len(hist["cost"]))
    print(f"Simulation completed in {wall:.0f} ms")
    print(f"Average step time: {wall / n:.2f} ms")
    if len(hist["solve_ms"]) > 1:
        steady = hist["solve_ms"][1:]
        print(f"Steady-state solve: {sum(steady)/len(steady):.2f} ms "
              f"(first step incl. compile: {hist['solve_ms'][0]:.0f} ms)")
    if args.profile:
        print(prof.report())


if __name__ == "__main__":
    main()
