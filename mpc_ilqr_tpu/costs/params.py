"""Cost parameters and Q/R/Qf construction (reference config.cpp:66-122).

The reference builds dense diagonal matrices; we keep the diagonals as
vectors (the off-diagonals are structurally zero) and expose dense views
where needed. `CostParams` is a pytree, so fleet instances can carry
randomized weights under vmap.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from mpc_ilqr_tpu.models.robot import RobotModel


class CostParams(struct.PyTreeNode):
    """Cost weights (pytree). `quat_tangent` is a static mode switch:
    False = the reference's raw quaternion subtraction (ilqr.cpp:141 — the
    parity default); True = tangent-space orientation error
    2·log(q_ref⁻¹ ⊗ q) weighted by the Q_quat_xyz rows (the geometrically
    correct option, SURVEY §7 hard part 3)."""

    Q: jnp.ndarray  # (nx,) state tracking diag
    R: jnp.ndarray  # (nu,) control effort diag
    Qf: jnp.ndarray  # (nx,) terminal diag
    w_com: jnp.ndarray  # CoM position tracking (W_com_pos)
    w_com_vel: jnp.ndarray  # CoM velocity tracking (W_com_vel)
    w_ee_pos: jnp.ndarray  # swing-foot position tracking (W_foot)
    w_ee_vel: jnp.ndarray  # stance-foot zero-velocity (W_foot_vel)
    w_upright: jnp.ndarray  # torso-upright penalty (W_upright)
    w_balance: jnp.ndarray  # capture-point balance (w_balance)
    w_joint_limits: jnp.ndarray  # soft joint-limit penalty
    w_torque_limits: jnp.ndarray  # soft torque-limit penalty
    limit_margin: jnp.ndarray  # fractional safety margin (0.1 in reference)
    balance_g: jnp.ndarray  # gravity constant inside the capture point (9.81
    # hardcoded in the reference regardless of sim gravity, ilqr.cpp:417)
    quat_tangent: bool = struct.field(pytree_node=False, default=False)


def build_cost_params(
    model: RobotModel,
    weights: dict,
    constraints: dict,
    dtype=jnp.float32,
    quat_tangent: bool = False,
) -> CostParams:
    """Build Q/R/Qf diagonals exactly as Config::buildCostMatrices does.

    `weights` carries the config.yaml `cost_weights` keys, `constraints` the
    `constraints` keys. Layout (nq=26): [pos(3), quat(4), joints(nq-7)] then
    velocities [lin(3), ang(3), joint(nv-6)].
    """
    nq, nx, nu = model.nq, model.nx, model.nu
    Q = [1.0] * nx
    Q[0] = weights["Q_position_x"]
    Q[1] = weights["Q_position_y"]
    Q[2] = weights["Q_position_z"]
    Q[3] = weights["Q_quat_w"]
    Q[4], Q[5], Q[6] = weights["Q_quat_xyz"]
    for i in range(7, nq):
        Q[i] = weights["Q_joint_pos"]
    Q[nq + 0] = weights["Q_vel_x"]
    Q[nq + 1] = weights["Q_vel_y"]
    Q[nq + 2] = weights["Q_vel_z"]
    for i in range(nq + 3, nq + 6):
        Q[i] = weights["Q_ang_vel"]
    for i in range(nq + 6, nx):
        Q[i] = weights["Q_joint_vel"]

    R = [weights["R_control"]] * nu

    Qf = [qi * weights["Qf_multiplier"] for qi in Q]
    Qf[0] *= weights["Qf_position_x"]
    Qf[1] *= weights["Qf_position_y"]
    Qf[2] *= weights["Qf_position_z"]
    Qf[nq + 2] *= weights["Qf_vel_z"]

    c = lambda v: jnp.asarray(v, dtype=dtype)
    return CostParams(
        Q=c(Q),
        R=c(R),
        Qf=c(Qf),
        w_com=c(weights.get("W_com_pos", 0.0)),
        w_com_vel=c(weights.get("W_com_vel", 0.0)),
        w_ee_pos=c(weights.get("W_foot", 0.0)),
        w_ee_vel=c(weights.get("W_foot_vel", 0.0)),
        w_upright=c(weights.get("W_upright", 0.0)),
        w_balance=c(weights.get("w_balance", 0.0)),
        w_joint_limits=c(constraints.get("joint_limit_weight", 500.0)),
        w_torque_limits=c(constraints.get("torque_limit_weight", 1000.0)),
        limit_margin=c(0.1),
        balance_g=c(9.81),
        quat_tangent=quat_tangent,
    )
