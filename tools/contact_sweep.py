#!/usr/bin/env python3
"""Closed-loop contact-parameter sweep on the REAL MuJoCo plant.

The controller's ONLY model error vs the MuJoCo plant is the contact model
(measured: contact-free one-step gap 7e-9, contact states rms dv ~0.1 —
tools/ CPU study, round 3). This sweeps the engine's compliant-contact
(stiffness, damping) pairs through a full closed-loop walking run against
the reference-settings MuJoCo plant (robot_utils.cpp:588-592) and reports
base tracking error per pair.

TPU-native trick: the model pytree is a TRACED argument of the jitted
step_once, so every (stiffness, damping) pair reuses ONE compiled graph —
the sweep costs one compile + n_pairs * run, not n_pairs compiles.

Usage: python tools/contact_sweep.py [--steps 100] [--iters 4] [--pairs ...]
"""
from __future__ import annotations

import argparse
import functools
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

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def run_pair(step_once, prob, model, n_steps):
    import jax.numpy as jnp

    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller
    from mpc_ilqr_tpu.mpc.mujoco_plant import MuJoCoPlant

    app = prob.app
    plant = MuJoCoPlant(
        app.resolve(app.model_path),
        gravity=app.mpc.gravity,
        timestep=app.mpc.physics_dt,
        impratio=app.mpc.contact_impratio,
    )
    x = np.asarray(standing_state(model), dtype=np.float64)
    plant.set_state(x)
    substeps = max(1, round(app.mpc.dt / app.mpc.physics_dt))
    state = controller.init_state(model, prob.cfg)
    dtype = model.body_pos.dtype
    xs = []
    for i in range(n_steps):
        state, u, diag = jax.block_until_ready(
            step_once(model, state, jnp.asarray(x, dtype=dtype))
        )
        u_np = np.asarray(u, dtype=np.float64)
        if not np.isfinite(u_np).all():
            u_np = np.zeros_like(u_np)
        x = plant.step(u_np, substeps)
        xs.append(x.copy())
    return np.stack(xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--pairs", default="30000:3000,10000:1000,5000:300,2000:300",
                    help="comma list of stiffness:damping pairs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.mpc import controller, runner

    app = load_config(os.path.join(ROOT, "config.yaml"))  # stock = walking
    if args.iters is not None:
        app.engine["max_iterations"] = args.iters
    if args.tol is not None:
        app.engine["tolerance"] = args.tol
    prob = runner.setup(app)
    cp, cfg, refs = prob.cp, prob.cfg, prob.refs

    # model TRACED: one compile for the whole sweep.
    step_once = jax.jit(
        lambda m, s, x: controller.step_once(m, cp, cfg, refs, s, x)
    )

    q_ref = np.loadtxt(os.path.join(ROOT, "data", "q_ref2_mj.csv"), delimiter=",")
    results = []
    for pair in args.pairs.split(","):
        stiff, damp = (float(v) for v in pair.split(":"))
        model = prob.model.replace(
            contact_stiffness=jax.numpy.asarray(stiff, prob.model.contact_stiffness.dtype),
            contact_damping=jax.numpy.asarray(damp, prob.model.contact_damping.dtype),
        )
        t0 = time.perf_counter()
        xs = run_pair(step_once, prob, model, args.steps)
        wall = time.perf_counter() - t0
        ref = q_ref[1 : len(xs) + 1]
        r = {"stiffness": stiff, "damping": damp, "wall_s": round(wall, 1),
             "fell": bool(xs[-1, 2] < 0.7)}
        for i, lab in enumerate(["X", "Y", "Z"]):
            err = xs[: args.steps, i] - ref[: args.steps, i]
            r[f"{lab}_mean_mm"] = round(float(np.mean(np.abs(err))) * 1e3, 2)
            r[f"{lab}_max_mm"] = round(float(np.max(np.abs(err))) * 1e3, 2)
        results.append(r)
        print(json.dumps(r), flush=True)

    best = min(results, key=lambda r: r["X_mean_mm"] + 1e6 * r["fell"])
    print("# best:", json.dumps(best))


if __name__ == "__main__":
    main()
