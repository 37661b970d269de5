#!/usr/bin/env python3
"""Fleet-scale stage timing / linearization A/B (VERDICT r3 item 2).

At fleet scale the jacfwd tangent tensors ([fleet, N, 70, ...]) are
HBM-bound: linearize dominated the round-2 fleet step at 1.21 ms/inst.
One STAGE × one VARIANT per invocation — a fresh fleet-scale graph takes
10+ minutes through the remote compile service, so a single process must
never compile more than one (the three-variant version of this script
timed out at 50 min without producing a number).

Stages: linearize | quadraticize | backward | rollout | linesearch | step
Variants (linearize only): ad | ad_frozen_mass | fd

Usage:
  python tools/fleet_linearize_ab.py --stage linearize --variant fd --fleet 64
  python tools/fleet_linearize_ab.py --accuracy   # single-instance dA/dB check
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


def _setup():
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.mpc import runner

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    app = load_config(os.path.join(root, "config.yaml"))
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    return runner.setup(app)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fleet", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--fd-eps", type=float, default=1e-4)
    ap.add_argument("--stage", default="linearize",
                    choices=["linearize", "quadraticize", "backward", "rollout",
                             "linesearch", "step"])
    ap.add_argument("--variant", default="ad_frozen_mass",
                    choices=["ad", "ad_frozen_mass", "fd",
                             "structured", "structured_frozen_mass"])
    ap.add_argument("--accuracy", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mpc_ilqr_tpu.costs.quadratics import quadraticize, trajectory_cost
    from mpc_ilqr_tpu.costs.references import extract_window
    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.ilqr import solver as ilqr
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.parallel import fleet as fleet_mod

    prob = _setup()
    model, cp, cfg0, refs = prob.model, prob.cp, prob.cfg, prob.refs
    # The fleet-tuned solver config (bench_suite.bench_fleet)
    cfg = dataclasses.replace(
        ilqr.vmap_safe(cfg0),
        max_iterations=2,
        alphas=(1.0, 0.6, 0.2, 0.05),
        rollout_solver="masked",
        linearization=args.variant,
        fd_eps=args.fd_eps,
        rollout_backend="xla",
    )
    n = args.fleet

    x0 = standing_state(model)
    u_grav = engine.gravity_comp(model, x0)
    ubar = jnp.tile(u_grav[None], (cfg.N, 1))
    xbar = ilqr.rollout(model, cfg, x0, ubar)
    win = extract_window(refs, jnp.zeros((), jnp.int32), cfg.N)

    if args.accuracy:
        c_ad = dataclasses.replace(cfg, linearization="ad")
        A_ad, B_ad = jax.jit(lambda: ilqr.linearize(model, c_ad, xbar, ubar))()
        for nm, over in (("fd", {"linearization": "fd", "fd_eps": args.fd_eps}),
                         ("frozen_mass", {"linearization": "ad_frozen_mass"})):
            c = dataclasses.replace(cfg, **over)
            Ax, Bx = jax.jit(lambda c=c: ilqr.linearize(model, c, xbar, ubar))()
            dA = float(jnp.max(jnp.abs(Ax - A_ad)))
            dB = float(jnp.max(jnp.abs(Bx - B_ad)))
            print(f"accuracy {nm:12s} eps={args.fd_eps:g} "
                  f"max|dA|={dA:.2e} max|dB|={dB:.2e}", flush=True)
        return

    models = fleet_mod.randomized_models(model, jax.random.PRNGKey(0), n)
    xs_f = jnp.broadcast_to(xbar, (n,) + xbar.shape)
    us_f = jnp.broadcast_to(ubar, (n,) + ubar.shape)

    # Zero gains: the linesearch stage then times the pure rollout+cost batch.
    K = jnp.zeros((cfg.N, model.nu, model.nx), x0.dtype)
    kff = jnp.zeros((cfg.N, model.nu), x0.dtype)
    base = trajectory_cost(model, cp, win, xbar, ubar, mode=cfg.cost_mode)

    def stage_fn(name):
        if name == "linearize":
            return lambda m, e: jnp.sum(
                ilqr.linearize(m, cfg, xs_f[0] + e, us_f[0])[0][0, 0]
            )
        if name == "quadraticize":
            return lambda m, e: jnp.sum(
                quadraticize(m, cp, win, xs_f[0] + e, us_f[0]).lx[0]
            )
        if name == "rollout":
            return lambda m, e: jnp.sum(ilqr.rollout(m, cfg, x0 + e, us_f[0])[-1])
        if name == "backward":
            def f(m, e):
                A, B = ilqr.linearize(m, cfg, xs_f[0] + e, us_f[0])
                q2 = quadraticize(m, cp, win, xs_f[0] + e, us_f[0])
                K_, _ = ilqr.backward_pass(A, B, q2, jnp.asarray(1e-6, x0.dtype), cfg.pd_bump)
                return jnp.sum(K_[0])
            return f
        if name == "linesearch":
            return lambda m, e: ilqr.line_search(
                m, cp, cfg, win, x0 + e, xs_f[0], us_f[0], K, kff, base
            )[3]
        if name == "step":
            from mpc_ilqr_tpu.mpc import controller

            states = fleet_mod.fleet_init(models, cfg, n)
            st1 = jax.tree.map(lambda l: l[0], states)
            return lambda m, e: controller.step_once(
                m, cp, cfg, refs, st1, x0 + e
            )[2].cost
        raise KeyError(name)

    fn = stage_fn(args.stage)

    @jax.jit
    def run(seed):
        def body(acc, k):
            eps = (seed + k.astype(x0.dtype)) * 1e-9
            out = jax.vmap(lambda m: fn(m, eps))(models)
            return acc + jnp.sum(out), None

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
        f"stage={args.stage} variant={args.variant} fleet={n} "
        f"per-inst={per_inst:8.4f} ms (loop={min(ts):.1f} ms, compile={compile_s:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
