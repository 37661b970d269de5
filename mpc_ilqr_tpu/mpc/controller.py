"""Receding-horizon MPC controller — fully-jitted step (reference mpc.cpp).

`step_once` is one compiled program: reference-window gather → warm/cold
start → iLQR solve → TV-LQR control → state carry. The MPC carry is an
explicit pytree (MPCState), so it is trivially checkpointable/restorable —
the TPU answer to the reference's in-memory prev_xbar_/prev_ubar_/prev_K_
(mpc.cpp:108-112) and `reset()` (mpc.cpp:130-149).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from mpc_ilqr_tpu.costs.params import CostParams
from mpc_ilqr_tpu.costs.references import ReferenceSet, extract_window
from mpc_ilqr_tpu.dynamics import engine
from mpc_ilqr_tpu.ilqr import solver as ilqr
from mpc_ilqr_tpu.models.robot import RobotModel

HIGHEST = jax.lax.Precision.HIGHEST


class MPCState(struct.PyTreeNode):
    """Solve-to-solve carry (warm start + persistent regularization)."""

    t_idx: jnp.ndarray  # () i32 position in the reference track
    prev_xbar: jnp.ndarray  # (N+1, nx)
    prev_ubar: jnp.ndarray  # (N, nu)
    prev_K: jnp.ndarray  # (N, nu, nx)
    has_prev: jnp.ndarray  # () bool
    reg: jnp.ndarray  # () iLQR lambda, persists across solves (ilqr.hpp reg_lambda_)


class MPCDiagnostics(NamedTuple):
    cost: jnp.ndarray
    iterations: jnp.ndarray
    reg: jnp.ndarray
    solve_ok: jnp.ndarray


def init_state(model: RobotModel, cfg: ilqr.ILQRConfig, dtype=None) -> MPCState:
    dtype = dtype or model.body_pos.dtype
    N, nx, nu = cfg.N, model.nx, model.nu
    return MPCState(
        t_idx=jnp.zeros((), jnp.int32),
        prev_xbar=jnp.zeros((N + 1, nx), dtype),
        prev_ubar=jnp.zeros((N, nu), dtype),
        prev_K=jnp.zeros((N, nu, nx), dtype),
        has_prev=jnp.zeros((), bool),
        reg=jnp.asarray(cfg.reg_init, dtype),
    )


def reset(state: MPCState, cfg: ilqr.ILQRConfig) -> MPCState:
    """MPC::reset (mpc.cpp:130-149)."""
    return state.replace(
        t_idx=jnp.zeros((), jnp.int32),
        prev_xbar=jnp.zeros_like(state.prev_xbar),
        prev_ubar=jnp.zeros_like(state.prev_ubar),
        prev_K=jnp.zeros_like(state.prev_K),
        has_prev=jnp.zeros((), bool),
        reg=jnp.asarray(cfg.reg_init, state.reg.dtype),
    )


def _warm_start(model, cfg, x0, state: MPCState, plan=None):
    """Shift-by-one warm start (ilqr.cpp:68-81) vs. gravity-comp cold start
    (ilqr.cpp:92-115), selected at runtime with lax.cond."""

    def warm(_):
        ubar = jnp.concatenate([state.prev_ubar[1:], state.prev_ubar[-1:]], axis=0)
        # xbar: shift prev solution by one, re-roll the last step; x0 pinned.
        mid = state.prev_xbar[2:]  # x[t+1] = prev_x[t+2], t = 0..N-2
        x_last = engine.step(model, mid[-1], ubar[-1], cfg.n_substeps)
        xbar = jnp.concatenate([x0[None], mid, x_last[None]], axis=0)
        return ubar, xbar

    def cold(_):
        u_grav = engine.gravity_comp(model, x0)
        ubar = jnp.tile(u_grav[None], (cfg.N, 1))
        xbar = ilqr.rollout(model, cfg, x0, ubar, plan=plan)
        return ubar, xbar

    return jax.lax.cond(state.has_prev, warm, cold, None)


def step_once(
    model: RobotModel,
    cp: CostParams,
    cfg: ilqr.ILQRConfig,
    refs: ReferenceSet,
    state: MPCState,
    x_measured: jnp.ndarray,
    ls_fn=None,
    plan=None,
):
    """MPC::stepOnce (mpc.cpp:40-127) as one pure jitted function.

    ls_fn optionally swaps in a mesh-sharded line search; plan enables the
    Pallas whole-rollout kernels (see ilqr.solve). Returns (new_state,
    u_apply, diagnostics).
    """
    win = extract_window(refs, state.t_idx, cfg.N)  # MPC_extractReference
    ubar0, xbar0 = _warm_start(model, cfg, x_measured, state, plan=plan)

    sol = ilqr.solve(
        model, cp, cfg, x_measured, win, ubar0, xbar0, reg0=state.reg,
        ls_fn=ls_fn, plan=plan,
    )

    # TV-LQR control law u = ū₀ + K₀ (x − x̄₀)  (mpc.cpp:97-101)
    u_tvlqr = sol.ubar[0] + jnp.matmul(
        sol.K[0], x_measured - sol.xbar[0], precision=HIGHEST
    )
    # Failure fallback (mpc.cpp:82-91): previous control, else zero.
    ok = sol.success & jnp.isfinite(u_tvlqr).all()
    u_fallback = jnp.where(state.has_prev, state.prev_ubar[0], jnp.zeros_like(u_tvlqr))
    u_apply = jnp.where(ok, u_tvlqr, u_fallback)

    # On failure, leave the warm start and time index untouched (the
    # reference keeps prev_* and t_idx when stepOnce fails, mpc.cpp:85-118);
    # a non-finite solution must never poison the solve-to-solve carry.
    keep = lambda new, old: jnp.where(ok, new, old)
    new_state = MPCState(
        t_idx=keep(state.t_idx + 1, state.t_idx),
        prev_xbar=keep(sol.xbar, state.prev_xbar),
        prev_ubar=keep(sol.ubar, state.prev_ubar),
        prev_K=keep(sol.K, state.prev_K),
        has_prev=state.has_prev | ok,
        # λ persists across solves even on failure (iLQR keeps reg_lambda_ in
        # the reference) — but only if it stayed finite.
        reg=jnp.where(jnp.isfinite(sol.reg), sol.reg, state.reg),
    )
    diag = MPCDiagnostics(cost=sol.cost, iterations=sol.iterations, reg=sol.reg, solve_ok=ok)
    return new_state, u_apply, diag


def run_closed_loop(
    model: RobotModel,
    cp: CostParams,
    cfg: ilqr.ILQRConfig,
    refs: ReferenceSet,
    state0: MPCState,
    x0: jnp.ndarray,
    n_steps: int,
    plant_model: RobotModel = None,
    plant_substeps: int = 1,
    plan=None,
):
    """Fully-fused closed-loop MPC: controller + plant in ONE lax.scan.

    The reference's runSimulation loop round-trips through the host every
    20 ms step (humanoid_mpc.cpp:130-179). On TPU the plant is the same
    differentiable engine, so the whole plan-act cycle stays on device — one
    dispatch for the entire simulation. This is the deployment-shaped hot
    path (and the multi-chip "training step" for fleet rollouts).

    Returns (final_state, final_x, history) where history holds per-step
    (x, u, cost, iterations, solve_ok) stacked over n_steps.
    """
    plant = plant_model if plant_model is not None else model

    def body(carry, _):
        state, x = carry
        state, u, diag = step_once(model, cp, cfg, refs, state, x, plan=plan)
        x_next = engine.step(plant, x, u, plant_substeps)
        return (state, x_next), (x, u, diag.cost, diag.iterations, diag.solve_ok)

    (state, xT), (xs, us, costs, iters, oks) = jax.lax.scan(
        body, (state0, x0), None, length=n_steps
    )
    history = {"x": xs, "u": us, "cost": costs, "iterations": iters, "solve_ok": oks}
    return state, xT, history


def tvlqr_control(state: MPCState, x_measured: jnp.ndarray) -> jnp.ndarray:
    """Inter-solve TV-LQR feedback at a higher rate than stepOnce
    (MPC::computeTVLQRControl, mpc.cpp:168-179)."""
    u = state.prev_ubar[0] + jnp.matmul(
        state.prev_K[0], x_measured - state.prev_xbar[0], precision=HIGHEST
    )
    return jnp.where(state.has_prev, u, jnp.zeros_like(u))
