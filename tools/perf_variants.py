#!/usr/bin/env python3
"""A/B perf experiments on the fused standing closed loop (real TPU).

Variants: scan-vs-pallas backward, scan unroll factors, argmin line search.
Each variant is its own jit graph (expect a full compile per variant).

Usage: python tools/perf_variants.py [--variants base,unroll4,pallas,...]
"""
from __future__ import annotations

import argparse
import dataclasses
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

VARIANTS = {
    "base": {},
    "unroll4": {"scan_unroll": 4},
    "unroll8": {"scan_unroll": 8},
    "pallas": {"backward": "pallas"},
    "pallas_unroll4": {"backward": "pallas", "scan_unroll": 4},
    "argmin_full": {"line_search": "argmin", "cost_mode": "full"},
    # Block-structured exact linearize (engine.step_and_jac) vs the shipped
    # frozen-mass jacfwd: same flagship config otherwise.
    "structured": {"linearization": "structured_frozen_mass"},
    "structured_exact": {"linearization": "structured"},
    # Gauss-Newton task-cost Hessians (exact lx, lxx = JtJ via the residual
    # stack) — and the combined structured+GN candidate flagship.
    "gn": {"quad_mode": "gn"},
    "structured_gn": {"linearization": "structured_frozen_mass",
                      "quad_mode": "gn"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,unroll4,pallas")
    ap.add_argument("--steps", type=int, default=15)
    args = ap.parse_args()

    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller, runner

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    app = load_config(os.path.join(root, "config.yaml"))
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    prob = runner.setup(app)
    x = standing_state(prob.model)

    for name in args.variants.split(","):
        cfg = dataclasses.replace(prob.cfg, **VARIANTS[name])
        run = jax.jit(
            functools.partial(controller.run_closed_loop, prob.model, prob.cp, cfg),
            static_argnames=("n_steps",),
        )
        state = controller.init_state(prob.model, cfg)
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(prob.refs, state, x, n_steps=args.steps))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            x_i = x.at[2].add(1e-6 * (i + 1))
            _, xf, hist = jax.block_until_ready(run(prob.refs, state, x_i, n_steps=args.steps))
        ms = (time.perf_counter() - t0) * 1e3 / reps / args.steps
        print(json.dumps({
            "variant": name, "ms_per_step": round(ms, 3),
            "compile_s": round(compile_s, 1),
            "final_cost": round(float(hist["cost"][-1]), 4),
            "base_z": round(float(xf[2]), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
