#!/usr/bin/env python3
"""Roofline / MFU accounting for the iLQR solve stages (VERDICT r3 weak 7).

For each solver stage this measures on-device time (fused repetition loops —
the axon tunnel adds ~28 ms per dispatch, so stages repeat inside one jitted
lax.scan and the dispatch floor is subtracted) and pulls FLOP and HBM-byte
counts from XLA's own cost model (``compiled.cost_analysis()``), then places
each stage on the TPU v5e roofline:

    floor_ms = max(flops / PEAK_FLOPS, bytes / PEAK_HBM_BW)

A stage whose measured ms is close to its floor_ms is at the hardware
roofline — more kernel work cannot help; one far above it is dispatch- or
latency-bound (serial scan chains at tiny sizes), which is capacity the
batch/fleet axes recover, not single-solve kernels.

Peaks (TPU v5e / "v5 lite", one chip): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
The solver runs f32 with Precision.HIGHEST (bf16x3 passes on the MXU), so
f32 matmul peak is taken as 197/6 ≈ 32.8 TFLOP/s — both bounds reported.

Emits a markdown table (for PERF.md) and docs/artifacts/roofline_<cfg>.json.

Usage: python tools/roofline.py [--config standing|long_horizon] [--reps 50]
"""
from __future__ import annotations

import argparse
import dataclasses
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

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

PEAK_BF16_FLOPS = 197e12   # TPU v5e MXU, bf16
PEAK_F32_FLOPS = PEAK_BF16_FLOPS / 6.0  # Precision.HIGHEST = bf16x3 passes
PEAK_HBM_BPS = 819e9       # TPU v5e HBM bandwidth


def _cost_analysis(compiled, reps):
    """XLA's flop/byte estimate for ONE stage call, extracted from the
    already-compiled timing loop (reps iterations of the stage inside one
    lax.scan) and divided by reps. Reusing the timing executable instead of
    compiling the bare stage separately HALVES the number of remote compiles
    — each costs 2-12 min through the compile service and is NOT served by
    the local .jax_cache (measured: a full 13-compile run blew a 40-min
    budget twice). The scan bookkeeping adds O(reps) scalar flops — noise
    against the stage body. None on failure."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) / reps
        bytes_ = float(ca.get("bytes accessed", 0.0)) / reps
        return flops, bytes_
    except Exception as e:  # noqa: BLE001
        print(f"# cost_analysis failed: {e}", file=sys.stderr)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--config", default="standing",
                    choices=["standing", "long_horizon"])
    ap.add_argument("--lin", default=None)
    ap.add_argument("--quad", default=None)
    ap.add_argument("--stages", default=None,
                    help="comma list of stages to run (default: all except "
                         "'solve' — the whole-solve wall number already "
                         "lands in BENCH/PERF and its fused graph is the "
                         "most expensive remote compile by far)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mpc_ilqr_tpu.costs.quadratics import quadraticize, trajectory_cost
    from mpc_ilqr_tpu.costs.references import extract_window
    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.ilqr import solver as ilqr
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import runner

    app = load_config(os.path.join(ROOT, "config.yaml"))
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    if args.config == "long_horizon":
        app.mpc.dt = 0.01
        app.mpc.physics_dt = 0.01
        app.mpc.horizon = 100
    prob = runner.setup(app)
    model, cp, cfg, refs = prob.model, prob.cp, prob.cfg, prob.refs
    if args.lin:
        cfg = dataclasses.replace(cfg, linearization=args.lin)
    if args.quad:
        cfg = dataclasses.replace(cfg, quad_mode=args.quad)

    x0 = standing_state(model)
    win = extract_window(refs, jnp.zeros((), jnp.int32), cfg.N)
    u_grav = engine.gravity_comp(model, x0)
    ubar = jnp.tile(u_grav[None], (cfg.N, 1))
    xbar = ilqr.rollout(model, cfg, x0, ubar)
    A, B = ilqr.linearize(model, cfg, xbar, ubar)
    quad = quadraticize(model, cp, win, xbar, ubar)
    lam = jnp.asarray(1e-6, x0.dtype)
    K, kff = ilqr.backward_pass(A, B, quad, lam, cfg.pd_bump)
    base = trajectory_cost(model, cp, win, xbar, ubar, mode=cfg.cost_mode)

    STAGES = {
        "rollout": lambda e: jnp.sum(ilqr.rollout(model, cfg, x0 + e, ubar)[-1]),
        "linearize": lambda e: jnp.sum(
            ilqr.linearize(model, cfg, xbar + e, ubar)[0]),
        "quadraticize": lambda e: jnp.sum(
            quadraticize(model, cp, win, xbar + e, ubar,
                         hess_mode=cfg.quad_mode).lx),
        "backward": lambda e: jnp.sum(
            ilqr.backward_pass(A + e, B, quad, lam, cfg.pd_bump)[0]),
        "line_search": lambda e: ilqr.line_search(
            model, cp, cfg, win, x0 + e, xbar, ubar, K, kff, base)[3],
        "solve": lambda e: ilqr.solve(model, cp, cfg, x0 + e, win, ubar).cost,
    }

    REPS = args.reps

    def reploop(fn):
        @jax.jit
        def run(seed):
            def body(acc, k):
                eps = (seed + k.astype(x0.dtype)) * 1e-9
                return acc + fn(eps), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), jnp.arange(REPS))
            return acc
        return run

    # Per-process random seed salt: the remote execution layer's dedupe
    # cache outlives the process, so deterministic seeds could replay an
    # earlier run's results at ~0 ms. The seed is a traced argument — the
    # salt changes only its value, not the graph (AOT/cache digests stable).
    salt = float(np.random.default_rng().uniform(0.0, 1.0))

    # Dispatch floor: an empty reploop, same call shape.
    floor_run = reploop(lambda e: e)
    jax.block_until_ready(floor_run(jnp.asarray(salt, x0.dtype)))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(floor_run(jnp.asarray(float(r + 1) + salt, x0.dtype)))
        ts.append(time.perf_counter() - t0)
    floor_s = min(ts)

    wanted = (args.stages.split(",") if args.stages
              else [s for s in STAGES if s != "solve"])

    # Incremental artifact writes: a budget timeout still leaves every
    # completed stage's row on disk (the all-or-nothing version lost two
    # full 40-min runs to compile-budget overruns).
    outdir = os.path.join(ROOT, "docs", "artifacts")
    os.makedirs(outdir, exist_ok=True)
    tagged = f"roofline_{args.config}" + (f"_lin_{args.lin}" if args.lin else "") \
        + (f"_quad_{args.quad}" if args.quad else "")
    outpath = os.path.join(outdir, f"{tagged}.json")

    rows = []

    def _write():
        out = {
            "config": args.config,
            "N": int(cfg.N),
            "lin": cfg.linearization,
            "quad": cfg.quad_mode,
            "device": str(jax.devices()[0]),
            "dispatch_floor_ms": round(floor_s * 1e3, 2),
            "reps": REPS,
            "peaks": {"f32_tflops": PEAK_F32_FLOPS / 1e12,
                      "bf16_tflops": PEAK_BF16_FLOPS / 1e12,
                      "hbm_gb_s": PEAK_HBM_BPS / 1e9},
            "stages": rows,
        }
        with open(outpath, "w") as f:
            json.dump(out, f, indent=2)

    for name in wanted:
        fn = STAGES[name]
        t0 = time.perf_counter()
        compiled = reploop(fn).lower(jnp.asarray(salt, x0.dtype)).compile()
        print(f"# {name}: compile {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        run = compiled
        jax.block_until_ready(run(jnp.asarray(salt, x0.dtype)))
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.asarray(float(r + 1) + salt, x0.dtype)))
            ts.append(time.perf_counter() - t0)
        ms = (min(ts) - floor_s) / REPS * 1e3
        ca = _cost_analysis(compiled, REPS)
        row = {"stage": name, "ms": round(ms, 4)}
        if ca is not None:
            flops, bytes_ = ca
            t_compute_f32 = flops / PEAK_F32_FLOPS
            t_hbm = bytes_ / PEAK_HBM_BPS
            floor_ms = max(t_compute_f32, t_hbm) * 1e3
            row.update({
                "gflops": round(flops / 1e9, 3),
                "hbm_mb": round(bytes_ / 1e6, 2),
                "achieved_gflops_s": round(flops / (ms / 1e3) / 1e9, 1),
                "achieved_gb_s": round(bytes_ / (ms / 1e3) / 1e9, 1),
                "pct_f32_peak": round(100 * flops / (ms / 1e3) / PEAK_F32_FLOPS, 2),
                "pct_hbm_peak": round(100 * bytes_ / (ms / 1e3) / PEAK_HBM_BPS, 2),
                "roofline_floor_ms": round(floor_ms, 4),
                "x_above_floor": round(ms / floor_ms, 1) if floor_ms > 0 else None,
                "bound": "hbm" if t_hbm > t_compute_f32 else "compute",
            })
        rows.append(row)
        _write()
        print(json.dumps(row), flush=True)

    # Markdown table for PERF.md.
    print("\n| stage | ms | GFLOP | HBM MB | % f32 peak | % HBM peak | "
          "floor ms | × floor | bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        if "gflops" in r:
            print(f"| {r['stage']} | {r['ms']:.3f} | {r['gflops']} | "
                  f"{r['hbm_mb']} | {r['pct_f32_peak']} | {r['pct_hbm_peak']} | "
                  f"{r['roofline_floor_ms']} | {r['x_above_floor']} | {r['bound']} |")
        else:
            print(f"| {r['stage']} | {r['ms']:.3f} | — | — | — | — | — | — | — |")


if __name__ == "__main__":
    main()
