"""AD quadraticization of the cost along a trajectory.

Replaces iLQR::computeCostQuadratics + the CasADi gradient/Hessian factory
(ilqr.cpp:133-244, derivatives.cpp): one vmapped jax.grad / jax.hessian over
the horizon produces lx/lu/lxx/luu for every timestep in a single fused
device computation. lxu is structurally zero (the stage cost is separable in
x and u, as in the reference, ilqr.cpp:151, 199).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_ilqr_tpu.costs import terms
from mpc_ilqr_tpu.costs.params import CostParams
from mpc_ilqr_tpu.costs.references import ReferenceWindow
from mpc_ilqr_tpu.models.robot import RobotModel


class CostQuadratics(NamedTuple):
    lx: jnp.ndarray  # (N+1, nx)
    lu: jnp.ndarray  # (N, nu)
    lxx: jnp.ndarray  # (N+1, nx, nx)
    luu: jnp.ndarray  # (N, nu, nu)


def _hessian_chunked(f, n: int, chunk: int, dtype):
    """jax.hessian(f) computed as jacfwd-of-grad in direction groups of
    `chunk` via lax.map — same math, peak tangent memory scaled by chunk/n.
    At fleet scale the full-width x-Hessian tangents ([fleet, N, 51, FK
    internals]) are the residual HBM peak after lin_chunk (measured:
    2 × 7.8 GB at fleet=1024); this is the same cure applied to the cost
    side. chunk<=0 or chunk>=n returns plain jax.hessian."""
    if chunk <= 0 or chunk >= n:
        return jax.hessian(f)

    pad = (-n) % chunk
    eye = jnp.eye(n, dtype=dtype)
    if pad:
        eye = jnp.concatenate([eye, jnp.zeros((pad, n), dtype)], axis=0)
    eye_g = eye.reshape(-1, chunk, n)

    def hess(x, *args):
        g = lambda xx: jax.grad(f)(xx, *args)
        cols = lambda E: jax.vmap(lambda e: jax.jvp(g, (x,), (e,))[1])(E)
        return jax.lax.map(cols, eye_g).reshape(-1, n)[:n]

    return hess


def _jacfwd_chunked(f, n: int, chunk: int, dtype):
    """jax.jacfwd(f) in direction groups of `chunk` via lax.map.

    Same cure as _hessian_chunked, for the GN residual Jacobian: plain
    jacfwd(R_stage) pushes all nx=51 tangents through FK simultaneously —
    at fleet scale that is THE HBM peak (measured round 4: the chunk=1024
    fleet OOM'd on a f32[1024,25,51,20,25,3] = 9.7 GB FK-tangent temp at
    kinematics.py:183 even in gn mode, because hess_chunk never reached
    the jacfwd). chunk<=0 or chunk>=n returns plain jax.jacfwd."""
    if chunk <= 0 or chunk >= n:
        return jax.jacfwd(f)

    pad = (-n) % chunk
    eye = jnp.eye(n, dtype=dtype)
    if pad:
        eye = jnp.concatenate([eye, jnp.zeros((pad, n), dtype)], axis=0)
    eye_g = eye.reshape(-1, chunk, n)

    def jac(x, *args):
        ff = lambda xx: f(xx, *args)
        cols = lambda E: jax.vmap(lambda e: jax.jvp(ff, (x,), (e,))[1])(E)
        out = jax.lax.map(cols, eye_g)  # (groups, chunk, nr)
        nr = out.shape[-1]
        return out.reshape(-1, nr)[:n].T  # (nr, n) == jacfwd layout

    return jac


def quadraticize(
    model: RobotModel,
    cp: CostParams,
    win: ReferenceWindow,
    xbar: jnp.ndarray,
    ubar: jnp.ndarray,
    hess_chunk: int = 0,
    hess_mode: str = "exact",
) -> CostQuadratics:
    if hess_mode == "gn":
        return _quadraticize_gn(model, cp, win, xbar, ubar,
                                hess_chunk=hess_chunk)
    N = ubar.shape[0]

    def stage_x(x, t):
        return terms.stage_cost_full(
            model, cp, x, ubar[t], win.x[t], win.u[t], win.com[t], win.com_vel[t],
            win.ee_pos[t], win.stance[t],
        )

    def stage_u(u, t):
        return terms.tracking_cost(
            cp, xbar[t], win.x[t], u, win.u[t], model=model
        ) + terms.torque_limit_cost(model, cp, u)

    ts = jnp.arange(N)
    nx = xbar.shape[-1]
    lx_s = jax.vmap(jax.grad(stage_x))(xbar[:N], ts)
    lxx_s = jax.vmap(_hessian_chunked(stage_x, nx, hess_chunk, xbar.dtype))(xbar[:N], ts)
    lu = jax.vmap(jax.grad(stage_u))(ubar, ts)
    luu = jax.vmap(jax.hessian(stage_u))(ubar, ts)  # nu=19: never the peak

    def term_x(x):
        return terms.terminal_cost_full(
            model, cp, x, win.x[N], win.com[N], win.com_vel[N], win.ee_pos[N], win.stance[N]
        )

    lx_N = jax.grad(term_x)(xbar[N])
    lxx_N = jax.hessian(term_x)(xbar[N])

    lx = jnp.concatenate([lx_s, lx_N[None]], axis=0)
    lxx = jnp.concatenate([lxx_s, lxx_N[None]], axis=0)
    return CostQuadratics(lx=lx, lu=lu, lxx=lxx, luu=luu)


def _quadraticize_gn(model, cp, win, xbar, ubar,
                     hess_chunk: int = 0) -> CostQuadratics:
    """Gauss-Newton quadraticization (hess_mode="gn").

    The stage cost splits into a LIGHT part (tracking + soft limits — no
    FK; exact grad/hessian of a tiny graph) and the FK-dependent TASK part,
    written as 0.5·||r(x)||² (terms.task_residuals). For the task part:

        lx  = Jᵀ r          — EXACT (the gradient of a sum of squares),
        lxx ≈ Jᵀ J          — Gauss-Newton: drops Σᵢ rᵢ ∇²rᵢ.

    Same fixed points as "exact" (lx untouched), PSD task Hessian by
    construction, and the nx tangents flow through the PRIMAL residual
    graph (plain FK jvps, hess_chunk-groupable via _jacfwd_chunked)
    instead of jax.hessian's jacfwd-of-grad double graph — the fleet-scale
    cost Hessian was the residual HBM peak after lin_chunk (2 × 7.8 GB at
    1024 in exact mode; 9.7 GB unchunked-jacfwd in gn mode, round-4 OOM).
    """
    N = ubar.shape[0]
    nx = xbar.shape[-1]

    def light_x(x, t):
        return (terms.tracking_cost(cp, x, win.x[t], model=model)
                + terms.joint_limit_cost(model, cp, x))

    def stage_u(u, t):
        return terms.tracking_cost(
            cp, xbar[t], win.x[t], u, win.u[t], model=model
        ) + terms.torque_limit_cost(model, cp, u)

    def R_stage(x, t):
        return terms.task_residuals(
            model, cp, x, win.com[t], win.com_vel[t], win.ee_pos[t], win.stance[t]
        )

    ts = jnp.arange(N)
    lx_l = jax.vmap(jax.grad(light_x))(xbar[:N], ts)
    lxx_l = jax.vmap(jax.hessian(light_x))(xbar[:N], ts)
    r_s = jax.vmap(R_stage)(xbar[:N], ts)            # (N, nr)
    J_s = jax.vmap(_jacfwd_chunked(R_stage, nx, hess_chunk, xbar.dtype))(
        xbar[:N], ts)                                # (N, nr, nx)
    lx_s = lx_l + jnp.einsum("tri,tr->ti", J_s, r_s)
    lxx_s = lxx_l + jnp.einsum("tri,trj->tij", J_s, J_s)

    lu = jax.vmap(jax.grad(stage_u))(ubar, ts)
    luu = jax.vmap(jax.hessian(stage_u))(ubar, ts)

    def light_N(x):
        return (terms.tracking_cost(cp, x, win.x[N], terminal=True, model=model)
                + terms.joint_limit_cost(model, cp, x))

    def R_N(x):
        return terms.task_residuals(
            model, cp, x, win.com[N], win.com_vel[N], win.ee_pos[N],
            win.stance[N], terminal=True,
        )

    r_N = R_N(xbar[N])
    J_N = jax.jacfwd(R_N)(xbar[N])
    lx_N = jax.grad(light_N)(xbar[N]) + jnp.matmul(J_N.T, r_N)
    lxx_N = jax.hessian(light_N)(xbar[N]) + jnp.matmul(J_N.T, J_N)

    lx = jnp.concatenate([lx_s, lx_N[None]], axis=0)
    lxx = jnp.concatenate([lxx_s, lxx_N[None]], axis=0)
    return CostQuadratics(lx=lx, lu=lu, lxx=lxx, luu=luu)


def trajectory_cost(
    model: RobotModel,
    cp: CostParams,
    win: ReferenceWindow,
    xs: jnp.ndarray,
    us: jnp.ndarray,
    mode: str = "reference",
) -> jnp.ndarray:
    """Total cost of a candidate trajectory (iLQR::computeTotalCost)."""
    N = us.shape[0]

    def one(t):
        return terms.stage_cost_eval(
            model, cp, xs[t], us[t], win.x[t], win.u[t], win.com[t], win.com_vel[t],
            win.ee_pos[t], win.stance[t], mode=mode,
        )

    stage = jax.vmap(one)(jnp.arange(N)).sum()
    term = terms.terminal_cost_eval(
        model, cp, xs[N], win.x[N], win.com[N], win.com_vel[N], win.ee_pos[N], win.stance[N],
        mode=mode,
    )
    return stage + term
