#!/usr/bin/env python3
"""Benchmark suite — all five BASELINE.json configs.

Each config prints one JSON line (same schema as bench.py):
  standing      fused closed-loop standing MPC, ms/step (= bench.py headline)
  walking       fused closed-loop walking MPC (contact schedule), ms/step
  linesearch    16 alphas × 8 warm-start seeds batched per iteration, solves/s
  long_horizon  N=100 @ 100 Hz replanning, ms/step
  fleet         1024 domain-randomized H1 instances, one fleet MPC step,
                instance·steps/s

Usage: python tools/bench_suite.py [--config NAME|all] [--steps K] [--cpu]
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

# Default compile cache; --cache-dir overrides it (e.g. a throwaway tmpdir
# so each process of a median-of-3 protocol gets an INDEPENDENT remote
# compile — the compile service is non-deterministic, up to 1.9x spread).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "BENCH_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    ),
)

REFERENCE_MS = 2472.80  # reference avg MPC step (README.md:203)
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


_PARITY = False  # --parity: reference solver settings (ilqr.cpp:16)


def _setup(standing: bool, **cfg_overrides):
    import jax.numpy as jnp

    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.mpc import runner

    app = load_config(os.path.join(ROOT, "config.yaml"))
    if standing:
        app.q_ref_path = "data/q_standing.csv"
        app.v_ref_path = "data/v_standing.csv"
        app.contact_schedule_path = "data/contact_standing.csv"
    if _PARITY:
        # The reference's solver settings (tol 1e-4, 10 iterations,
        # /root/reference/src/ilqr/ilqr.cpp:16) instead of the TPU-tuned
        # deployment defaults in config.yaml — VERDICT r2 weak 5: report
        # parity-settings perf alongside the tuned headline.
        app.engine["tolerance"] = 1e-4
        app.engine["max_iterations"] = 10
    prob = runner.setup(app)
    if cfg_overrides:
        prob = prob._replace(cfg=dataclasses.replace(prob.cfg, **cfg_overrides))
    return prob


def _timed_loop(prob, n_steps, reps=3, aot_name=None, run_fn=None):
    import jax.numpy as jnp
    import numpy as np

    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller

    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs
    x = standing_state(model)
    state = controller.init_state(model, cfg)
    if aot_name is not None:
        # AOT fast path (VERDICT r3 weak 4): deserialize the pre-compiled
        # executable from artifacts/aot/ instead of a 10-25 min remote
        # compile; falls back to jit (and refreshes the artifact) on any
        # source/config/hardware fingerprint mismatch.
        from mpc_ilqr_tpu.utils import aot

        fn = run_fn if run_fn is not None else functools.partial(
            controller.run_closed_loop, model, cp, cfg, plan=prob.plan
        )
        run, used_aot, compile_s = aot.jit_or_aot(
            aot_name, fn, (refs, state, x),
            static_argnames=("n_steps",), n_steps=n_steps,
        )
        print(f"# aot={used_aot} compile={compile_s:.1f}s", file=sys.stderr)
        if used_aot:
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(refs, state, x))
            compile_s = time.perf_counter() - t0  # load+first-exec, not compile
        _run = run
        run = lambda r, s, xx, n_steps=None: _run(r, s, xx)  # noqa: E731
    else:
        run = jax.jit(
            run_fn if run_fn is not None else functools.partial(
                controller.run_closed_loop, model, cp, cfg, plan=prob.plan),
            static_argnames=("n_steps",),
        )
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(refs, state, x, n_steps=n_steps))
        compile_s = time.perf_counter() - t0
    # Perturb x0 per rep, salted with per-process randomness: the remote
    # execution layer dedupes byte-identical invocations and its cache
    # outlives the process — a deterministic perturbation replays a previous
    # run's results at ~0 ms (observed on the N=100 config: 0.21 "ms"/step).
    salt = float(np.random.default_rng().uniform(0.5, 1.5)) * 1e-6
    rep_ms = []
    for i in range(reps):
        x_i = x.at[2].add(salt * (i + 1))
        t0 = time.perf_counter()
        _, xf, hist = jax.block_until_ready(run(refs, state, x_i, n_steps=n_steps))
        rep_ms.append((time.perf_counter() - t0) * 1e3)
    ms_per_step = float(np.mean(rep_ms)) / n_steps
    return ms_per_step, compile_s, hist, xf


def _ls_overrides(args):
    """Solver-numerics overrides: --ls-backend (notably 'pallas_batched':
    all alphas in ONE kernel program), --lin, --quad."""
    ov = {}
    if args.ls_backend:
        ov["ls_backend"] = args.ls_backend
    if getattr(args, "lin", None):
        ov["linearization"] = args.lin
    if getattr(args, "quad", None):
        ov["quad_mode"] = args.quad
    if getattr(args, "linevery", None):
        ov["linearize_every"] = args.linevery
    return ov


def _numerics_tag(args):
    tag = ""
    if args.ls_backend:
        tag += f"_ls_{args.ls_backend}"
    if getattr(args, "lin", None):
        tag += f"_lin_{args.lin}"
    if getattr(args, "quad", None):
        tag += f"_quad_{args.quad}"
    if getattr(args, "linevery", None):
        tag += f"_linevery_{args.linevery}"
    return tag


def _aot_name(args, config, n_steps):
    if not getattr(args, "aot", False):
        return None
    return f"suite_{config}{'_parity' if _PARITY else ''}{_numerics_tag(args)}_s{n_steps}"


def bench_standing(args):
    prob = _setup(standing=True, **_ls_overrides(args))
    ms, compile_s, hist, xf = _timed_loop(
        prob, args.steps, aot_name=_aot_name(args, "standing", args.steps))
    tag = ("_parity" if _PARITY else "") + _numerics_tag(args)
    _emit(f"standing_mpc_ms_per_step{tag}", ms, "ms", REFERENCE_MS / ms,
          compile_s=compile_s, final_cost=float(hist["cost"][-1]), base_z=float(xf[2]))


def bench_walking(args):
    prob = _setup(standing=False, **_ls_overrides(args))
    ms, compile_s, hist, xf = _timed_loop(
        prob, args.steps, aot_name=_aot_name(args, "walking", args.steps))
    tag = ("_parity" if _PARITY else "") + _numerics_tag(args)
    _emit(f"walking_mpc_ms_per_step{tag}", ms, "ms", REFERENCE_MS / ms,
          compile_s=compile_s, final_cost=float(hist["cost"][-1]), base_z=float(xf[2]))


def bench_linesearch(args):
    """16 alphas × 8 warm-start seeds, all in one batched solve call."""
    import jax.numpy as jnp
    import numpy as np

    from mpc_ilqr_tpu.costs.references import extract_window
    from mpc_ilqr_tpu.ilqr import solver as ilqr
    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.models.robot import standing_state

    alphas16 = tuple(float(a) for a in (1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3,
                                        0.2, 0.15, 0.1, 0.07, 0.05, 0.03, 0.02, 0.01))
    # first_accept: cascade degenerates under the vmap over seeds (cond->select)
    prob = _setup(standing=True, alphas=alphas16, max_iterations=3,
                  line_search="first_accept", **_ls_overrides(args))
    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs
    x0 = standing_state(model)
    win = extract_window(refs, jnp.zeros((), jnp.int32), cfg.N)
    u_grav = engine.gravity_comp(model, x0)
    key = jax.random.PRNGKey(0)
    seeds = u_grav[None, None, :] + 0.5 * jax.random.normal(
        key, (8, cfg.N, model.nu), dtype=x0.dtype
    )

    if getattr(args, "aot", False):
        from mpc_ilqr_tpu.utils import aot

        solve8_, used_aot, compile_s = aot.jit_or_aot(
            f"suite_linesearch{_numerics_tag(args)}",
            jax.vmap(lambda u0: ilqr.solve(model, cp, cfg, x0, win, u0)),
            (seeds,))
        print(f"# aot={used_aot} compile={compile_s:.1f}s", file=sys.stderr)
        t0 = time.perf_counter()
        out = jax.block_until_ready(solve8_(seeds))
        if not used_aot:
            compile_s += time.perf_counter() - t0
        solve8 = solve8_
    else:
        solve8 = jax.jit(jax.vmap(lambda u0: ilqr.solve(model, cp, cfg, x0, win, u0)))
        t0 = time.perf_counter()
        out = jax.block_until_ready(solve8(seeds))
        compile_s = time.perf_counter() - t0
    reps = 5
    salt = float(np.random.default_rng().uniform(0.5, 1.5)) * 1e-6
    t0 = time.perf_counter()
    for i in range(reps):
        sol = jax.block_until_ready(solve8(seeds + salt * (i + 1)))
    dt = (time.perf_counter() - t0) / reps
    solves_per_s = 8 / dt
    _emit(f"batched_linesearch_solves_per_s{_numerics_tag(args)}",
          solves_per_s, "solves/s",
          solves_per_s / (1000.0 / REFERENCE_MS), compile_s=compile_s,
          mean_cost=float(np.mean(np.asarray(sol.cost))))


def _tvlqr_amortized_loop(prob, solve_every: int):
    """Closed loop that solves every `solve_every`-th plant step and applies
    inter-solve TV-LQR feedback from the last solution in between — the
    reference's own inter-solve mechanism (MPC::computeTVLQRControl,
    mpc.cpp:168-179: feedback at a higher rate than stepOnce). One scan over
    solve CYCLES (no lax.cond — the skip steps are unrolled in the cycle
    body), so the per-control-step cost is solve/k + a gain matmul + a
    plant step. The skip steps advance t_idx so the next solve's reference
    window stays time-aligned; its shift-by-one warm start is then stale by
    k-1 steps (0.01(k-1) s), which the line search absorbs — solution
    quality is checked by the emitted final_cost/base_z."""
    import functools

    import jax.numpy as jnp

    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.mpc import controller

    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs
    HI = jax.lax.Precision.HIGHEST

    def run(refs, state0, x0, n_steps: int):
        n_cycles = n_steps // solve_every

        def cycle(carry, _):
            state, x = carry
            state, u, diag = controller.step_once(
                model, cp, cfg, refs, state, x, plan=prob.plan)
            x = engine.step(model, x, u, cfg.n_substeps)
            for k in range(1, solve_every):
                u = state.prev_ubar[k] + jnp.matmul(
                    state.prev_K[k], x - state.prev_xbar[k], precision=HI)
                x = engine.step(model, x, u, cfg.n_substeps)
                state = state.replace(t_idx=state.t_idx + 1)
            return (state, x), (diag.cost, diag.solve_ok)

        (state, xT), (costs, oks) = jax.lax.scan(
            cycle, (state0, x0), None, length=n_cycles)
        return state, xT, {"cost": costs, "solve_ok": oks}

    return run


def bench_long_horizon(args):
    """N=100 @ 100 Hz (dt=0.01) replanning stress (Riccati scan depth)."""
    import dataclasses

    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.mpc import runner

    app = load_config(os.path.join(ROOT, "config.yaml"))
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    app.mpc.dt = 0.01
    app.mpc.physics_dt = 0.01
    app.mpc.horizon = 100
    prob = runner.setup(app)
    tag = ""
    if args.lh_tuned:
        # Deployment-tuned N=100 knobs: the 10 ms budget (BASELINE config 4)
        # leaves room for ~2 of the ~5 ms serial iteration chains; the
        # fleet-proven stale-A/B + no-retry trades recover the rest.
        tag = "_tuned"
        prob = prob._replace(cfg=dataclasses.replace(
            prob.cfg, max_iterations=2, inner_attempts=1, linearize_every=2,
            outer_loop="scan",
        ))
    if args.lh_backward != "scan":
        tag += f"_{args.lh_backward}"
        prob = prob._replace(cfg=dataclasses.replace(
            prob.cfg, backward=args.lh_backward))
    if args.lh_iters is not None:
        # At 100 Hz replanning the warm-start shift is a 0.01 s perturbation
        # of an already-solved trajectory; the reference itself "typically"
        # converges in 1 iteration (README.md:273-275). final_cost/base_z in
        # the emitted line carry the solution-quality check for the A/B.
        tag += f"_it{args.lh_iters}"
        prob = prob._replace(cfg=dataclasses.replace(
            prob.cfg, max_iterations=args.lh_iters))
    if args.ls_backend:
        tag += f"_ls_{args.ls_backend}"
        prob = prob._replace(cfg=dataclasses.replace(
            prob.cfg, ls_backend=args.ls_backend))
    if getattr(args, "lin", None):
        tag += f"_lin_{args.lin}"
        prob = prob._replace(cfg=dataclasses.replace(
            prob.cfg, linearization=args.lin))
    if getattr(args, "quad", None):
        tag += f"_quad_{args.quad}"
        prob = prob._replace(cfg=dataclasses.replace(
            prob.cfg, quad_mode=args.quad))
    n_lh = max(4, args.steps // 3)
    run_fn = None
    if args.lh_solve_every > 1:
        k = args.lh_solve_every
        tag += f"_tvlqr{k}"
        n_lh = max(3 * k, (n_lh // k) * k)
        run_fn = _tvlqr_amortized_loop(prob, k)
    ms, compile_s, hist, xf = _timed_loop(
        prob, n_lh, reps=2,
        aot_name=_aot_name(args, f"long_horizon{tag}", n_lh), run_fn=run_fn)
    _emit(f"long_horizon_N100_ms_per_step{tag}", ms, "ms", REFERENCE_MS / ms,
          compile_s=compile_s, base_z=float(xf[2]),
          final_cost=float(hist["cost"][-1]))


def bench_fleet(args):
    """1024 domain-randomized H1 instances, one fused fleet MPC step."""
    import jax.numpy as jnp
    import numpy as np

    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.parallel import fleet as fleet_mod

    n = args.fleet
    # Fleet-tuned solver config (A/B'd on TPU): first_accept NOT cascade
    # (lax.cond lowers to select under vmap, so a cascade would execute both
    # phases per instance), 4 alphas, the batch-friendly masked SPD solver,
    # lockstep 2 iterations.
    overrides = dict(
        max_iterations=2,
        line_search="first_accept",
        alphas=(1.0, 0.6, 0.2, 0.05),
        rollout_solver="masked",
        inner_attempts=args.fleet_attempts,
        linearize_every=args.fleet_linevery,
        lin_chunk=args.fleet_linchunk,
        hess_chunk=args.fleet_hesschunk,
    )
    if args.fleet_lin:
        overrides["linearization"] = args.fleet_lin
    if args.fleet_quad:
        overrides["quad_mode"] = args.fleet_quad
    prob = _setup(standing=True, **overrides)
    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs
    models = fleet_mod.randomized_models(model, jax.random.PRNGKey(0), n)
    states = fleet_mod.fleet_init(models, cfg, n)
    xs = jnp.tile(standing_state(model)[None], (n, 1))
    chunk = min(args.chunk, n)
    if getattr(args, "aot", False):
        from mpc_ilqr_tpu.utils import aot

        step, used_aot, compile_s = aot.jit_or_aot(
            f"suite_fleet{n}_c{chunk}",
            lambda m, s, x: fleet_mod.fleet_step_chunked(m, cp, cfg, refs, s, x, chunk),
            (models, states, xs),
            key=repr(sorted(overrides.items())))
        print(f"# aot={used_aot} compile={compile_s:.1f}s", file=sys.stderr)
        t0 = time.perf_counter()
        out = jax.block_until_ready(step(models, states, xs))
        if not used_aot:
            compile_s += time.perf_counter() - t0
    else:
        step = jax.jit(
            lambda m, s, x: fleet_mod.fleet_step_chunked(m, cp, cfg, refs, s, x, chunk)
        )
        t0 = time.perf_counter()
        out = jax.block_until_ready(step(models, states, xs))
        compile_s = time.perf_counter() - t0
    reps = 3
    salt = float(np.random.default_rng().uniform(0.5, 1.5)) * 1e-6
    t0 = time.perf_counter()
    for i in range(reps):
        s2, us, diag = jax.block_until_ready(step(models, states, xs + salt * (i + 1)))
    dt = (time.perf_counter() - t0) / reps
    inst_steps_per_s = n / dt
    _emit("fleet_mpc_instance_steps_per_s", inst_steps_per_s, "steps/s",
          inst_steps_per_s / (1000.0 / REFERENCE_MS), compile_s=compile_s,
          fleet=n, ok=int(np.sum(np.asarray(diag.solve_ok))),
          mean_cost=float(np.mean(np.asarray(diag.cost))),
          max_cost=float(np.max(np.asarray(diag.cost))))


def _emit(metric, value, unit, vs_baseline, **extra):
    print(f"# {extra}", file=sys.stderr)
    print(json.dumps({
        "metric": metric, "value": round(float(value), 3), "unit": unit,
        "vs_baseline": round(float(vs_baseline), 2),
    }), flush=True)


CONFIGS = {
    "standing": bench_standing,
    "walking": bench_walking,
    "linesearch": bench_linesearch,
    "long_horizon": bench_long_horizon,
    "fleet": bench_fleet,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="all", choices=list(CONFIGS) + ["all"])
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--fleet", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=128,
                    help="fleet vmap chunk (lax.map over fleet/chunk chunks); "
                         "bigger chunks amortize the serial rollout chains, "
                         "bounded by the linearize tangent HBM footprint")
    ap.add_argument("--fleet-attempts", type=int, default=2,
                    help="inner (backward+LS) attempts per outer iteration "
                         "(1 = no same-iteration retry; fleet-tuned)")
    ap.add_argument("--fleet-linevery", type=int, default=1,
                    help="re-linearize every k-th outer iteration (k>1 "
                         "reuses stale A/B quasi-Newton style)")
    ap.add_argument("--fleet-linchunk", type=int, default=0,
                    help="linearize direction-chunk size (lax.map groups); "
                         "caps the tangent-tensor HBM peak so the whole "
                         "fleet can run as ONE vmapped solve (--chunk 1024)")
    ap.add_argument("--fleet-hesschunk", type=int, default=0,
                    help="cost x-Hessian direction-chunk size (see "
                         "--fleet-linchunk; the residual HBM peak at "
                         "fleet=1024 is the 51-direction Hessian)")
    ap.add_argument("--lin", default=None,
                    choices=["ad", "ad_frozen_mass", "fd",
                             "structured", "structured_frozen_mass"],
                    help="standing/walking linearization override")
    ap.add_argument("--quad", default=None, choices=["exact", "gn"],
                    help="standing/walking cost-Hessian mode override")
    ap.add_argument("--fleet-quad", default=None, choices=["exact", "gn"],
                    help="cost x-Hessian mode: gn = Gauss-Newton residual "
                         "stack (exact lx, lxx=JtJ, ~23 FK tangents instead "
                         "of the 51-direction jacfwd-of-grad sweep)")
    ap.add_argument("--lh-backward", default="scan",
                    choices=["scan", "pallas", "assoc"],
                    help="long_horizon Riccati backward variant: serial "
                         "lax.scan, one-launch pallas kernel, or the "
                         "associative parallel scan (depth log N)")
    ap.add_argument("--lh-solve-every", type=int, default=1,
                    help="long_horizon: solve every k-th control step and "
                         "apply inter-solve TV-LQR feedback in between "
                         "(the reference's computeTVLQRControl mechanism, "
                         "mpc.cpp:168-179); reported ms/step is amortized "
                         "per CONTROL step")
    ap.add_argument("--lh-iters", type=int, default=None,
                    help="long_horizon max_iterations override (applied "
                         "after --lh-tuned; e.g. 1 for the warm-start-"
                         "sufficient single-iteration deployment point)")
    ap.add_argument("--lh-tuned", action="store_true",
                    help="long_horizon with the deployment-tuned solver "
                         "knobs (max_iterations=2, inner_attempts=1, "
                         "linearize_every=2) instead of config.yaml's")
    ap.add_argument("--fleet-lin", default=None,
                    choices=["ad", "ad_frozen_mass", "fd",
                             "structured", "structured_frozen_mass"],
                    help="fleet linearization variant override; fd has no "
                         "jacfwd tangent tensors (plain batched primal step "
                         "evals), so much larger --chunk values fit in HBM")
    ap.add_argument("--ls-backend", default=None,
                    choices=["xla", "pallas", "pallas_batched"],
                    help="override ILQRConfig.ls_backend for standing/"
                    "walking/long_horizon (pallas_batched = all alphas in "
                    "one kernel program, ops/quat_step_batch.py)")
    ap.add_argument("--linevery", type=int, default=None,
                    help="override ILQRConfig.linearize_every for standing/"
                    "walking/long_horizon (stale-A/B re-use: linearize on "
                    "every k-th iteration; the fleet's biggest lever)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--aot", action="store_true",
                    help="use artifacts/aot/ pre-compiled executables when "
                         "fingerprint-valid; refresh them after a cold "
                         "compile (replaces the committed-.jax_cache ritual)")
    ap.add_argument("--parity", action="store_true",
                    help="reference solver settings: tol 1e-4, 10 iterations "
                         "(ilqr.cpp:16) — applies to standing/walking")
    args = ap.parse_args()
    global _PARITY
    _PARITY = args.parity
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    names = list(CONFIGS) if args.config == "all" else [args.config]
    for name in names:
        print(f"# --- {name} ---", file=sys.stderr)
        CONFIGS[name](args)


if __name__ == "__main__":
    main()
