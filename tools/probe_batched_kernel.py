#!/usr/bin/env python3
"""Compile + time the batched-alpha line-search kernel on the TPU.

Cheap lowering probe for ops/quat_step_batch.py: compiles the ONE-program
batched kernel standalone (small N first, then the target N) before any
fused-solver graph burns a 10-25 min remote compile. Prints max|diff| vs the
XLA closed-loop rollouts and per-call timings vs the per-alpha grid kernel.

Usage: python tools/probe_batched_kernel.py [--N 25] [--A 8] [--reps 30]
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

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=25)
    ap.add_argument("--A", type=int, default=8)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true", help="interpret-mode dry run")
    ap.add_argument("--skip-grid", action="store_true",
                    help="skip the per-alpha grid kernel comparison")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mpc_ilqr_tpu.models.robot import load_h1, standing_state
    from mpc_ilqr_tpu.ops.quat_step import build_step_plan, step_mosaic
    from mpc_ilqr_tpu.ops.rollout_kernel import (
        linesearch_rollout_pallas,
        linesearch_rollout_pallas_batched,
    )

    interp = args.cpu
    m = load_h1(dtype=jnp.float32)
    plan = build_step_plan(m)
    rng = np.random.default_rng(0)
    N, A = args.N, args.A
    f32 = jnp.float32
    x0 = jnp.asarray(standing_state(m), f32)
    ubar = jnp.asarray(2.0 * rng.standard_normal((N, m.nu)), f32)
    xbar = x0[None, :] + jnp.asarray(0.005 * rng.standard_normal((N + 1, m.nx)), f32)
    K = jnp.asarray(0.02 * rng.standard_normal((N, m.nu, m.nx)), f32)
    kff = jnp.asarray(0.05 * rng.standard_normal((N, m.nu)), f32)
    alphas = jnp.asarray([1.0, 0.8, 0.6, 0.4, 0.2, 0.1, 0.05, 0.01][: A], f32)

    def timed(tag, fn, *xs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*xs))
        compile_s = time.perf_counter() - t0
        best = np.inf
        for i in range(args.reps):
            xs_i = (xs[0] + 1e-6 * (i + 1),) + xs[1:]
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*xs_i))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: compile {compile_s:.1f}s, best-of-{args.reps} "
              f"{best * 1e3:.3f} ms")
        return out

    roll_b = jax.jit(functools.partial(
        linesearch_rollout_pallas_batched, m, plan,
        alphas=alphas, n_substeps=1, interpret=interp))
    xs_b, us_b = timed(f"batched kernel  (A={A}, N={N})",
                       lambda x, xb, ub, K_, kf: roll_b(x, xb, ub, K_, kf),
                       x0, xbar, ubar, K, kff)

    if not args.skip_grid:
        roll_g = jax.jit(functools.partial(
            linesearch_rollout_pallas, m, plan,
            alphas=alphas, n_substeps=1, interpret=interp))
        xs_g, _ = timed(f"grid kernel     (A={A}, N={N})",
                        lambda x, xb, ub, K_, kf: roll_g(x, xb, ub, K_, kf),
                        x0, xbar, ubar, K, kff)
        print("batched-vs-grid max|dx|:", float(jnp.max(jnp.abs(xs_b - xs_g))))

    @jax.jit
    def roll_xla(x0_, xbar_, ubar_, K_, kff_):
        def roll_one(alpha):
            def f(x, inp):
                xb, ub, K_t, k_t = inp
                u = ub + alpha * k_t + jnp.matmul(
                    K_t, x - xb, precision=jax.lax.Precision.HIGHEST)
                xn = step_mosaic(m, plan, x, u, 1)
                return xn, (xn, u)

            _, (xs_tail, us) = jax.lax.scan(f, x0_, (xbar_[:-1], ubar_, K_, kff_))
            return jnp.concatenate([x0_[None], xs_tail], axis=0), us

        return jax.vmap(roll_one)(alphas)

    xs_x, _ = timed(f"xla vmap chains (A={A}, N={N})", roll_xla,
                    x0, xbar, ubar, K, kff)
    print("batched-vs-xla  max|dx|:", float(jnp.max(jnp.abs(xs_b - xs_x))))


if __name__ == "__main__":
    main()
