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


def quadraticize(
    model: RobotModel,
    cp: CostParams,
    win: ReferenceWindow,
    xbar: jnp.ndarray,
    ubar: jnp.ndarray,
    hess_chunk: int = 0,
) -> CostQuadratics:
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
