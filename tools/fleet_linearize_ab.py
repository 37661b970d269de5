#!/usr/bin/env python3
"""A/B the fleet-scale linearization backends (VERDICT r3 item 2).

At fleet scale the jacfwd tangent tensors ([fleet, N, 70, ...]) are
HBM-bound: linearize dominates the fleet step at 1.21 ms/inst (round-2
trace). Candidates measured here, per instance, inside one fused rep loop
(the axon tunnel adds ~28 ms/dispatch, so stages repeat in-graph):

  ad              exact jacfwd tangents
  ad_frozen_mass  zero tangents through M(q) (round-2 default)
  fd              batched forward differences (robot_utils.cpp:120-160
                  recipe) — NO tangent tensors, 70 primal re-evaluations

Also reports max |A_fd - A_ad| to bound the FD truncation error at the
given eps (f32 needs eps >> 1e-5; the reference's 1e-5 is an f64 value).

Usage: python tools/fleet_linearize_ab.py [--fleet 128] [--reps 10] [--cpu]
"""
from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--fleet", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--fd-eps", type=float, default=1e-4)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.ilqr import solver as ilqr
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import runner
    from mpc_ilqr_tpu.parallel import fleet as fleet_mod

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    app = load_config(os.path.join(root, "config.yaml"))
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    prob = runner.setup(app)
    model, cfg = prob.model, prob.cfg
    n = args.fleet
    print(f"device={jax.devices()[0]} fleet={n} N={cfg.N} reps={args.reps}", flush=True)

    models = fleet_mod.randomized_models(model, jax.random.PRNGKey(0), n)
    x0 = standing_state(model)
    u_grav = engine.gravity_comp(model, x0)
    ubar = jnp.tile(u_grav[None], (cfg.N, 1))
    xbar = ilqr.rollout(model, cfg, x0, ubar)
    xs_f = jnp.broadcast_to(xbar, (n,) + xbar.shape)
    us_f = jnp.broadcast_to(ubar, (n,) + ubar.shape)

    def timed_variant(name, **over):
        c = dataclasses.replace(cfg, **over)

        @jax.jit
        def run(seed):
            def body(acc, k):
                eps = (seed + k.astype(x0.dtype)) * 1e-9
                A, B = jax.vmap(lambda m, xs, us: ilqr.linearize(m, c, xs, us))(
                    models, xs_f + eps, us_f
                )
                return acc + jnp.sum(A[:, 0, 0, 0]) + jnp.sum(B[:, 0, 0, 0]), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), jnp.arange(args.reps))
            return acc

        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.asarray(0.0, x0.dtype)))
        compile_s = time.perf_counter() - t0
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.asarray(float(r + 1), x0.dtype)))
            ts.append((time.perf_counter() - t0) * 1e3)
        per_inst = min(ts) / args.reps / n
        print(
            f"{name:22s} per-inst={per_inst:8.4f} ms  "
            f"(loop={min(ts):8.1f} ms, compile={compile_s:.0f}s)",
            flush=True,
        )
        return per_inst

    # Accuracy bound: single-instance A/B at this eps.
    c_ad = dataclasses.replace(cfg, linearization="ad")
    c_fd = dataclasses.replace(cfg, linearization="fd", fd_eps=args.fd_eps)
    c_fm = dataclasses.replace(cfg, linearization="ad_frozen_mass")
    A_ad, B_ad = jax.jit(lambda: ilqr.linearize(model, c_ad, xbar, ubar))()
    A_fd, B_fd = jax.jit(lambda: ilqr.linearize(model, c_fd, xbar, ubar))()
    A_fm, B_fm = jax.jit(lambda: ilqr.linearize(model, c_fm, xbar, ubar))()
    for nm, Ax, Bx in (("fd", A_fd, B_fd), ("frozen_mass", A_fm, B_fm)):
        dA = float(jnp.max(jnp.abs(Ax - A_ad)))
        dB = float(jnp.max(jnp.abs(Bx - B_ad)))
        print(f"accuracy {nm:12s} max|dA|={dA:.2e} max|dB|={dB:.2e}", flush=True)

    timed_variant("ad_frozen_mass", linearization="ad_frozen_mass")
    timed_variant("fd(eps=%g)" % args.fd_eps, linearization="fd", fd_eps=args.fd_eps)
    timed_variant("ad(exact)", linearization="ad")


if __name__ == "__main__":
    main()
