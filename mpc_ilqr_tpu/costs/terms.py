"""Cost terms — exact functional twins of the reference's cost library.

Weight conventions are preserved verbatim, including the reference's mixed
0.5 factors (they shape the optimum, so parity requires them):
- tracking:    0.5 eᵀQe + 0.5 eᵀRe            (ilqr.cpp:374-375)
- CoM pos/vel: w·‖e‖²   (NO 0.5)              (derivatives.cpp:548, 581)
- EE pos/vel:  w·‖e‖²   (NO 0.5)              (derivatives.cpp:608, 641)
- upright:     0.5·w·‖z_torso − ẑ‖²           (derivatives.cpp:650-667)
- balance:     0.5·w·‖p_cp − p_support‖²      (derivatives.cpp:671-704)
- soft limits: w·violation² with 10% margins  (robot_utils.cpp:615-672)

Contact gating matches ilqr.cpp:697-748: EE position cost only in SWING,
EE zero-velocity cost only in STANCE; the balance support center averages
the reference positions of the feet currently in stance and the term is
skipped in flight.

All terms are plain differentiable functions of (x, u); quadraticization is
jax.grad / jax.hessian (costs/quadratics.py), replacing the CasADi factory.
"""
from __future__ import annotations

import jax.numpy as jnp

from mpc_ilqr_tpu.costs.params import CostParams
from mpc_ilqr_tpu.dynamics import kinematics as kin
from mpc_ilqr_tpu.models.robot import RobotModel


def tracking_cost(cp: CostParams, x, x_ref, u=None, u_ref=None, terminal=False, model=None):
    """Quadratic state/control tracking (ilqr.cpp:374-375).

    With cp.quat_tangent and a floating-base model, the base-quaternion
    rows of the raw difference are replaced by the tangent-space error
    log(q_ref⁻¹ ⊗ q), weighted by the Q_quat_xyz rows (the Q_quat_w row is
    unused in that mode) — double-cover safe, unlike the reference's raw
    subtraction (SURVEY §7 hard part 3).
    """
    from mpc_ilqr_tpu.dynamics import math as qm

    e = x - x_ref
    W = cp.Qf if terminal else cp.Q
    if cp.quat_tangent and model is not None and model.has_free_base:
        mask = jnp.ones_like(e).at[3:7].set(0.0)
        dq = qm.quat_mul(qm.quat_conj(x_ref[3:7]), qm.quat_normalize(x[3:7]))
        delta = qm.quat_log(dq)
        c = 0.5 * jnp.sum(W * mask * e * e) + 0.5 * jnp.sum(W[4:7] * delta * delta)
    else:
        c = 0.5 * jnp.sum(W * e * e)
    if u is not None:
        eu = u - u_ref
        c = c + 0.5 * jnp.sum(cp.R * eu * eu)
    return c


def com_cost(model: RobotModel, cp: CostParams, x, com_ref, feats=None):
    feats = feats or kin.task_features(model, x)
    e = feats.com - com_ref
    return cp.w_com * jnp.sum(e * e)


def com_vel_cost(model: RobotModel, cp: CostParams, x, com_vel_ref, feats=None):
    feats = feats or kin.task_features(model, x)
    e = feats.com_vel - com_vel_ref
    return cp.w_com_vel * jnp.sum(e * e)


def ee_pos_cost(model: RobotModel, cp: CostParams, x, ee_ref, stance, feats=None):
    """Swing-gated foot position tracking. ee_ref (n_ee,3), stance (n_ee,)."""
    feats = feats or kin.task_features(model, x)
    e2 = jnp.sum((feats.ee_pos - ee_ref) ** 2, axis=-1)
    return cp.w_ee_pos * jnp.sum((1.0 - stance) * e2)


def ee_vel_cost(model: RobotModel, cp: CostParams, x, stance, feats=None):
    """Stance-gated zero-velocity foot cost (keeps the planted foot still)."""
    feats = feats or kin.task_features(model, x)
    e2 = jnp.sum(feats.ee_vel * feats.ee_vel, axis=-1)
    return cp.w_ee_vel * jnp.sum(stance * e2)


def upright_cost(cp: CostParams, x):
    """Torso z-axis vs world z from the base quaternion (ilqr.cpp:377-397)."""
    qw, qx, qy, qz = x[3], x[4], x[5], x[6]
    rx = 2.0 * (qx * qz + qw * qy)
    ry = 2.0 * (qy * qz - qw * qx)
    rz = 1.0 - 2.0 * (qx * qx + qy * qy) - 1.0
    return 0.5 * cp.w_upright * (rx * rx + ry * ry + rz * rz)


def support_center(ee_ref, stance):
    """Mean xy of the in-stance feet's reference positions; `active` is 0 when
    both feet are airborne (balance skipped, ilqr.cpp:788-791)."""
    w = stance
    denom = jnp.sum(w)
    active = jnp.where(denom > 0, 1.0, 0.0)
    center = jnp.sum(w[:, None] * ee_ref[:, :2], axis=0) / jnp.maximum(denom, 1.0)
    return center, active


def balance_cost(model: RobotModel, cp: CostParams, x, ee_ref, stance, base_vel_approx=False, feats=None):
    """Capture-point balance: p_cp = com_xy + vcom_xy·sqrt(h/g).

    base_vel_approx=True reproduces the reference's line-search evaluation,
    which approximates the CoM velocity by the base linear velocity
    (ilqr.cpp:411-413) — while its injected derivatives use the full CoM
    velocity (derivatives.cpp:688-689). Both are provided for parity.
    """
    feats = feats or kin.task_features(model, x)
    com = feats.com
    if base_vel_approx:
        vcom = x[model.nq : model.nq + 3]
    else:
        vcom = feats.com_vel
    omega0 = jnp.sqrt(jnp.maximum(com[2], 1e-6) / cp.balance_g)
    p_cp = com[:2] + vcom[:2] * omega0
    center, active = support_center(ee_ref, stance)
    r = p_cp - center
    return active * 0.5 * cp.w_balance * jnp.sum(r * r)


def joint_limit_cost(model: RobotModel, cp: CostParams, x):
    """Soft joint-range penalty with 10% margins (robot_utils.cpp:643-669)."""
    if not model.limit_qpos_idx:
        return jnp.zeros((), x.dtype)
    qj = x[jnp.array(model.limit_qpos_idx)]
    lo, hi = model.limit_range[:, 0], model.limit_range[:, 1]
    margin = cp.limit_margin * (hi - lo)
    v_hi = jnp.maximum(qj - (hi - margin), 0.0)
    v_lo = jnp.maximum((lo + margin) - qj, 0.0)
    return cp.w_joint_limits * jnp.sum(v_hi * v_hi + v_lo * v_lo)


def torque_limit_cost(model: RobotModel, cp: CostParams, u):
    """Soft ctrlrange penalty with 10% margins (robot_utils.cpp:621-641)."""
    lo, hi = model.ctrl_range[:, 0], model.ctrl_range[:, 1]
    margin = cp.limit_margin * (hi - lo)
    v_hi = jnp.maximum(u - (hi - margin), 0.0)
    v_lo = jnp.maximum((lo + margin) - u, 0.0)
    return cp.w_torque_limits * jnp.sum(v_hi * v_hi + v_lo * v_lo)


def task_residuals(model, cp, x, com_ref, com_vel_ref, ee_ref, stance,
                   terminal=False):
    """The FK-dependent task terms as ONE weighted residual stack r(x):

        0.5 · ||r(x)||² == com + com_vel + ee_pos + ee_vel + upright + balance

    exactly — each term's weight, gate, and 0.5-convention is folded into
    its rows via square roots (w·||e||² rows get sqrt(2w), 0.5·w·||e||² rows
    get sqrt(w); stance/active gates are per-knot constants, never functions
    of x, so the sqrt-gating is differentiation-safe). terminal=True drops
    the CoM-velocity rows (ilqr.cpp:202-243 quadraticizes no com-vel term at
    the terminal knot).

    This is the basis of the Gauss-Newton quadraticization
    (costs/quadratics.py hess_mode="gn"): lx = Jᵀr stays EXACT, and
    lxx ≈ JᵀJ needs only the nr≈23 residual-row tangents through FK instead
    of jax.hessian's nx=51 jacfwd-of-grad sweep.
    """
    feats = kin.task_features(model, x)
    s2 = lambda w: jnp.sqrt(2.0 * w)  # w·||e||² terms (no 0.5 in the ref)
    s1 = lambda w: jnp.sqrt(w)        # 0.5·w·||e||² terms
    rows = [s2(cp.w_com) * (feats.com - com_ref)]
    if not terminal:
        rows.append(s2(cp.w_com_vel) * (feats.com_vel - com_vel_ref))
    if model.n_ee:
        swing = jnp.sqrt(jnp.maximum(1.0 - stance, 0.0))
        rows.append(((s2(cp.w_ee_pos) * swing)[:, None]
                     * (feats.ee_pos - ee_ref)).reshape(-1))
        rows.append(((s2(cp.w_ee_vel) * jnp.sqrt(stance))[:, None]
                     * feats.ee_vel).reshape(-1))
    if model.has_free_base:
        qw, qx, qy, qz = x[3], x[4], x[5], x[6]
        rx = 2.0 * (qx * qz + qw * qy)
        ry = 2.0 * (qy * qz - qw * qx)
        rz = 1.0 - 2.0 * (qx * qx + qy * qy) - 1.0
        rows.append(s1(cp.w_upright) * jnp.stack([rx, ry, rz]))
        if model.n_ee:
            center, active = support_center(ee_ref, stance)
            omega0 = jnp.sqrt(jnp.maximum(feats.com[2], 1e-6) / cp.balance_g)
            p_cp = feats.com[:2] + feats.com_vel[:2] * omega0
            rows.append(s1(cp.w_balance * active) * (p_cp - center))
    return jnp.concatenate(rows)


# ---------------------------------------------------------------------------
# Assembled stage/terminal costs
# ---------------------------------------------------------------------------


def stage_cost_full(model, cp, x, u, x_ref, u_ref, com_ref, com_vel_ref, ee_ref, stance):
    """Every term the backward pass quadraticizes (ilqr.cpp:140-200).

    The upright/balance terms exist only for floating-base robots and the
    EE terms only when end-effectors are declared — static structure, so the
    guards resolve at trace time.
    """
    feats = kin.task_features(model, x)  # ONE FK shared by every task term
    c = tracking_cost(cp, x, x_ref, u, u_ref, model=model)
    c = c + com_cost(model, cp, x, com_ref, feats)
    c = c + com_vel_cost(model, cp, x, com_vel_ref, feats)
    if model.n_ee:
        c = c + ee_pos_cost(model, cp, x, ee_ref, stance, feats)
        c = c + ee_vel_cost(model, cp, x, stance, feats)
    if model.has_free_base:
        c = c + upright_cost(cp, x)
        if model.n_ee:
            c = c + balance_cost(model, cp, x, ee_ref, stance, feats=feats)
    c = c + joint_limit_cost(model, cp, x)
    c = c + torque_limit_cost(model, cp, u)
    return c


def terminal_cost_full(model, cp, x, x_ref, com_ref, com_vel_ref, ee_ref, stance):
    """Terminal quadraticized terms (ilqr.cpp:202-243: no torque penalty,
    no CoM-velocity term; Qf tracking + all x-only task costs)."""
    feats = kin.task_features(model, x)
    c = tracking_cost(cp, x, x_ref, terminal=True, model=model)
    c = c + com_cost(model, cp, x, com_ref, feats)
    if model.n_ee:
        c = c + ee_pos_cost(model, cp, x, ee_ref, stance, feats)
        c = c + ee_vel_cost(model, cp, x, stance, feats)
    if model.has_free_base:
        c = c + upright_cost(cp, x)
        if model.n_ee:
            c = c + balance_cost(model, cp, x, ee_ref, stance, feats=feats)
    c = c + joint_limit_cost(model, cp, x)
    return c


def stage_cost_eval(model, cp, x, u, x_ref, u_ref, com_ref, com_vel_ref, ee_ref, stance, mode="reference"):
    """The cost the line search measures.

    mode="reference" replicates iLQR::computeTotalCost (ilqr.cpp:363-518):
    tracking + upright + balance (base-velocity approximation) + soft limits —
    the CoM/EE tracking terms are injected into the quadratics but *not*
    evaluated in the line search (a reference inconsistency, kept for parity).

    mode="full" evaluates the same objective the backward pass optimizes
    (the mathematically consistent choice).
    """
    if mode == "reference":
        c = tracking_cost(cp, x, x_ref, u, u_ref, model=model)
        if model.has_free_base:
            c = c + upright_cost(cp, x)
            if model.n_ee:
                c = c + balance_cost(model, cp, x, ee_ref, stance, base_vel_approx=True)
        c = c + joint_limit_cost(model, cp, x)
        c = c + torque_limit_cost(model, cp, u)
        return c
    if mode == "full":
        return stage_cost_full(model, cp, x, u, x_ref, u_ref, com_ref, com_vel_ref, ee_ref, stance)
    raise ValueError(f"unknown cost eval mode {mode}")


def terminal_cost_eval(model, cp, x, x_ref, com_ref, com_vel_ref, ee_ref, stance, mode="reference"):
    if mode == "reference":
        c = tracking_cost(cp, x, x_ref, terminal=True, model=model)
        if model.has_free_base:
            c = c + upright_cost(cp, x)
            if model.n_ee:
                c = c + balance_cost(model, cp, x, ee_ref, stance, base_vel_approx=True)
        c = c + joint_limit_cost(model, cp, x)
        return c
    if mode == "full":
        return terminal_cost_full(model, cp, x, x_ref, com_ref, com_vel_ref, ee_ref, stance)
    raise ValueError(f"unknown cost eval mode {mode}")
