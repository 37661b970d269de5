#!/usr/bin/env python3
"""Walking-gait tracking on the REAL MuJoCo plant (VERDICT r3 item 3).

Runs the STOCK walking config (q_ref2_mj/v_ref2 + contact_walking.csv,
full N=25 horizon) closed-loop against a MuJoCo plant with the reference's
Newton/elliptic-cone solver settings (robot_utils.cpp:588-592) — the
reference's exact deployment shape (humanoid_mpc.cpp:122-190) — for
--steps steps (default 120 > the 100 the verdict asks for).

Outputs:
  docs/artifacts/walking_mujoco_tracking_comparison.png
  docs/artifacts/walking_mujoco_tracking_errors.png
  docs/artifacts/walking_mujoco_summary.json   (mean/max/RMS per axis)

Usage: python tools/walking_demo.py [--steps 120] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _run_engine_plant(prob, n_steps):
    """Closed loop with the differentiable engine as the plant — the same
    jitted step_once graph as the MuJoCo run (no StepPlan), different plant."""
    import functools

    import jax.numpy as jnp

    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller

    model, cp, cfg, refs, app = prob.model, prob.cp, prob.cfg, prob.refs, prob.app
    step_once = jax.jit(functools.partial(controller.step_once, model, cp, cfg))
    substeps = max(1, round(app.mpc.dt / app.mpc.physics_dt))
    plant_step = jax.jit(lambda xx, uu: engine.step(model, xx, uu, substeps))

    x = standing_state(model)
    state = controller.init_state(model, cfg)
    hist = {"x": [], "u": [], "cost": []}
    for i in range(n_steps):
        state, u, diag = jax.block_until_ready(step_once(refs, state, x))
        x = plant_step(x, u)
        hist["x"].append(np.asarray(x))
        hist["u"].append(np.asarray(u))
        hist["cost"].append(float(diag.cost))
        if i % 10 == 0:
            xh = np.asarray(x)
            print(f"[engine-loop] step {i}: cost {float(diag.cost):.4f} "
                  f"base x {xh[0]:.4f} z {xh[2]:.4f} qw {xh[3]:.4f}", flush=True)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--plant", default="mujoco", choices=["mujoco", "engine"],
                    help="mujoco = reference deployment shape; engine = "
                         "self-consistent diagnostic (isolates the contact-"
                         "model gap from controller/gait issues)")
    ap.add_argument("--iters", type=int, default=None,
                    help="override engine.max_iterations (10 = reference "
                         "parity, ilqr.cpp:16)")
    ap.add_argument("--tol", type=float, default=None,
                    help="override engine.tolerance (1e-4 = reference parity)")
    ap.add_argument("--tag", default=None,
                    help="artifact name tag (default walking_<plant>)")
    ap.add_argument("--gravity-z", type=float, default=None,
                    help="override world gravity z (e.g. -9.81; the stock "
                         "reference value is -1.0, config.yaml:20 — its own "
                         "balance cost hardcodes 9.81, ilqr.cpp:417)")
    ap.add_argument("--physics-dt", type=float, default=None,
                    help="override plant/engine physics_dt (0.005 = 4 "
                         "substeps per 50 Hz control step; needed at "
                         "physical gravity where contact loads are ~10x)")
    ap.add_argument("--contact-stiffness", type=float, default=None)
    ap.add_argument("--contact-damping", type=float, default=None)
    ap.add_argument("--outdir", default=os.path.join(ROOT, "docs", "artifacts"))
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.mpc import runner
    from mpc_ilqr_tpu.mpc.mujoco_plant import run_mujoco_in_the_loop

    app = load_config(os.path.join(ROOT, "config.yaml"))  # stock = walking
    if args.iters is not None:
        app.engine["max_iterations"] = args.iters
    if args.tol is not None:
        app.engine["tolerance"] = args.tol
    if args.gravity_z is not None:
        app.mpc.gravity = [0.0, 0.0, args.gravity_z]
    if args.physics_dt is not None:
        app.mpc.physics_dt = args.physics_dt
    if args.contact_stiffness is not None:
        app.engine["contact_stiffness"] = args.contact_stiffness
    if args.contact_damping is not None:
        app.engine["contact_damping"] = args.contact_damping
    prob = runner.setup(app)
    print(f"device={jax.devices()[0]} N={prob.cfg.N} steps={args.steps} "
          f"plant={args.plant}", flush=True)

    t0 = time.perf_counter()
    if args.plant == "engine":
        hist = _run_engine_plant(prob, args.steps)
    else:
        hist = run_mujoco_in_the_loop(prob, args.steps, verbose=True)
    wall = time.perf_counter() - t0

    xs = np.stack(hist["x"])  # state AFTER each plant step
    q_ref = np.loadtxt(os.path.join(ROOT, "data", "q_ref2_mj.csv"), delimiter=",")
    n = len(xs)
    # Plant state after step i corresponds to reference row i+1 (the window
    # at t_idx=i targets rows i..i+N; the first tracked knot is i+1).
    ref = q_ref[1 : n + 1]
    t = np.arange(n) * app.mpc.dt

    tag = args.tag or ("walking_mujoco" if args.plant == "mujoco" else "walking_engine")
    labels = ["X", "Y", "Z", "qw"]
    summary = {"steps": n, "plant": args.plant, "wall_s": round(wall, 1),
               "final_cost": hist["cost"][-1]}
    # The reference's own deployment length is sim_steps=100 (config.yaml:22)
    # — report that window separately when the run is longer. (Beyond ~t=2.5s
    # the gait demands up to 7.3 m/s^2 of horizontal acceleration, while the
    # stock gravity [0,0,-1] caps the friction cone at mu*g = 1.0 m/s^2 for
    # the 51.6 kg robot — physically untrackable for ANY controller, ours or
    # the reference's.)
    if n > 100:
        for i, lab in enumerate(labels):
            err100 = xs[:100, i] - ref[:100, i]
            summary[f"{lab}_mean_err_first100"] = float(np.mean(np.abs(err100)))
            summary[f"{lab}_max_err_first100"] = float(np.max(np.abs(err100)))
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    for ax, lab, i in zip(axes.ravel(), labels, range(4)):
        ax.plot(t, xs[:, i], label="MuJoCo plant")
        ax.plot(t, ref[:, i], "--", label="walking reference")
        ax.set_title(f"Base {lab} tracking (real MuJoCo physics)")
        ax.set_xlabel("time [s]")
        ax.legend()
        ax.grid(alpha=0.3)
        err = xs[:, i] - ref[:, i]
        summary[f"{lab}_mean_err"] = float(np.mean(np.abs(err)))
        summary[f"{lab}_max_err"] = float(np.max(np.abs(err)))
        summary[f"{lab}_rms_err"] = float(np.sqrt(np.mean(err**2)))
    os.makedirs(args.outdir, exist_ok=True)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, f"{tag}_tracking_comparison.png"), dpi=120)

    fig2, axes2 = plt.subplots(2, 2, figsize=(12, 8))
    for ax, lab, i in zip(axes2.ravel(), labels, range(4)):
        ax.plot(t, (xs[:, i] - ref[:, i]) * (1000.0 if i < 3 else 1.0))
        ax.set_title(f"Base {lab} error [{'mm' if i < 3 else 'quat'}]")
        ax.set_xlabel("time [s]")
        ax.grid(alpha=0.3)
    fig2.tight_layout()
    fig2.savefig(os.path.join(args.outdir, f"{tag}_tracking_errors.png"), dpi=120)

    np.save(os.path.join(args.outdir, f"{tag}_states.npy"), xs)
    with open(os.path.join(args.outdir, f"{tag}_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    x_max_mm = summary["X_max_err"] * 1000
    print(
        f"\nbase-X tracking: mean {summary['X_mean_err']*1000:.2f} mm, "
        f"max {x_max_mm:.2f} mm over {n} steps on real MuJoCo physics"
    )


if __name__ == "__main__":
    main()
