"""Forward kinematics, Jacobians, CoM — pure JAX, batched-friendly.

Replaces mj_forward-side kinematics plus every Pinocchio/CasADi kinematic
quantity the reference consumes: body poses (mj_jacBody targets,
robot_utils.cpp:393-410), subtree CoM (mj_jacSubtreeCom,
robot_utils.cpp:383-391), frame velocities (pinocchio getFrameVelocity
LOCAL_WORLD_ALIGNED, derivatives.cpp:625-646), and the mass-weighted CoM
(robot_utils.cpp:810-833). Everything is differentiable, so jax.grad /
jax.hessian replace the CasADi symbolic gradient/Hessian factory.

The body loop unrolls at trace time (nbody ≈ 20); all quantities broadcast
over leading batch axes of q/v, so `vmap` turns the whole stack into
VPU/MXU-batched array ops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Small ill-conditioned chains + Cholesky downstream: TPU's default bf16
# matmul precision is not enough. Pin full f32 on every contraction.
HIGHEST = jax.lax.Precision.HIGHEST

from mpc_ilqr_tpu.dynamics import math as qm
from mpc_ilqr_tpu.models.robot import JNT_FIXED, JNT_FREE, JNT_HINGE, RobotModel


class KinFrames(NamedTuple):
    """World-frame kinematic data for one configuration q."""

    R: jnp.ndarray  # (B, 3, 3) body orientations
    p: jnp.ndarray  # (B, 3) body frame origins
    dof_axis: jnp.ndarray  # (nv, 3) world axis of each dof
    dof_anchor: jnp.ndarray  # (nv, 3) world anchor point of rotational dofs
    dof_linear: jnp.ndarray  # (nv,) 1.0 for translational dofs


def forward_kinematics(model: RobotModel, q: jnp.ndarray) -> KinFrames:
    """Compute world poses of all bodies and per-dof world axes/anchors."""
    Rs = []
    ps = []
    axis_rows = [None] * model.nv
    anchor_rows = [None] * model.nv
    linear_flags = [0.0] * model.nv
    zero3 = jnp.zeros(3, dtype=q.dtype)

    for i in range(model.nbody):
        par = model.body_parent[i]
        if par < 0:
            Rp = jnp.eye(3, dtype=q.dtype)
            pp = zero3
        else:
            Rp, pp = Rs[par], ps[par]
        jtype = model.body_jnt_type[i]
        if jtype == JNT_FREE:
            a = model.body_qpos_adr[i]
            d = model.body_dof_adr[i]
            quat = qm.quat_normalize(q[a + 3 : a + 7])
            Ri = qm.quat_to_mat(quat)
            pi = q[a : a + 3]
            for k in range(3):
                axis_rows[d + k] = jnp.eye(3, dtype=q.dtype)[k]
                anchor_rows[d + k] = zero3
                linear_flags[d + k] = 1.0
            for k in range(3):
                # Angular velocity is body-local: world axis = k-th column of R.
                axis_rows[d + 3 + k] = Ri[:, k]
                anchor_rows[d + 3 + k] = pi
        else:
            Ri = jnp.matmul(Rp, qm.quat_to_mat(model.body_quat[i]), precision=HIGHEST)
            pi = pp + jnp.matmul(Rp, model.body_pos[i], precision=HIGHEST)
            if jtype == JNT_HINGE:
                a = model.body_qpos_adr[i]
                d = model.body_dof_adr[i]
                ax = model.jnt_axis[i]
                jp = model.jnt_pos[i]
                Rj = qm.quat_to_mat(qm.quat_axis_angle(ax, q[a]))
                # X_child = X_prejoint * Trans(jp) * Rot * Trans(-jp)
                pi = pi + jnp.matmul(Ri, jp - jnp.matmul(Rj, jp, precision=HIGHEST), precision=HIGHEST)
                Ri = jnp.matmul(Ri, Rj, precision=HIGHEST)
                axis_rows[d] = jnp.matmul(Ri, ax, precision=HIGHEST)
                anchor_rows[d] = pi + jnp.matmul(Ri, jp, precision=HIGHEST)
            elif jtype != JNT_FIXED:
                raise NotImplementedError(jtype)
        Rs.append(Ri)
        ps.append(pi)

    return KinFrames(
        R=jnp.stack(Rs),
        p=jnp.stack(ps),
        dof_axis=jnp.stack(axis_rows),
        dof_anchor=jnp.stack(anchor_rows),
        dof_linear=jnp.asarray(linear_flags, dtype=q.dtype),
    )


def point_jacobian(model: RobotModel, fr: KinFrames, body_idx: int, point_w: jnp.ndarray):
    """Linear-velocity Jacobian (3, nv) of a world-frame point on body_idx."""
    mask = model.ancestor_mask[body_idx]  # (nv,)
    lin = fr.dof_linear[:, None]
    rot_cols = jnp.cross(fr.dof_axis, point_w[None, :] - fr.dof_anchor)
    cols = lin * fr.dof_axis + (1.0 - lin) * rot_cols  # (nv, 3)
    return (cols * mask[:, None]).T


def body_jacobians(model: RobotModel, fr: KinFrames, points_w: jnp.ndarray):
    """Batched point Jacobians for one point per body.

    points_w: (B, 3) world point attached to each body.
    Returns Jv (B, 3, nv) linear and Jw (B, 3, nv) angular Jacobians.
    """
    mask = model.ancestor_mask  # (B, nv)
    lin = fr.dof_linear  # (nv,)
    # rot columns per (body, dof): axis_k × (p_b - anchor_k)
    diff = points_w[:, None, :] - fr.dof_anchor[None, :, :]  # (B, nv, 3)
    rot = jnp.cross(jnp.broadcast_to(fr.dof_axis, diff.shape), diff)
    cols_v = lin[None, :, None] * fr.dof_axis[None] + (1.0 - lin)[None, :, None] * rot
    Jv = jnp.swapaxes(cols_v * mask[:, :, None], -1, -2)  # (B, 3, nv)
    cols_w = (1.0 - lin)[None, :, None] * fr.dof_axis[None] * mask[:, :, None]
    Jw = jnp.swapaxes(cols_w, -1, -2)
    return Jv, Jw


def body_com_positions(model: RobotModel, fr: KinFrames) -> jnp.ndarray:
    """World positions of each body's CoM, shape (B, 3)."""
    return fr.p + jnp.einsum("bij,bj->bi", fr.R, model.body_ipos, precision=HIGHEST)


def com_position(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """Total mass-weighted CoM (robot_utils.cpp:810-833 semantics)."""
    fr = forward_kinematics(model, q)
    pc = body_com_positions(model, fr)
    m = model.body_mass
    return (m[:, None] * pc).sum(0) / m.sum()


def body_velocities(model: RobotModel, fr: KinFrames, v: jnp.ndarray):
    """Angular velocity and CoM linear velocity of every body.

    Returns (omega (B,3), vcom (B,3)) in world frame.
    """
    pc = body_com_positions(model, fr)
    Jv, Jw = body_jacobians(model, fr, pc)
    return jnp.einsum("bij,j->bi", Jw, v, precision=HIGHEST), jnp.einsum("bij,j->bi", Jv, v, precision=HIGHEST)


def com_velocity(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    fr = forward_kinematics(model, q)
    _, vc = body_velocities(model, fr, v)
    m = model.body_mass
    return (m[:, None] * vc).sum(0) / m.sum()


def ee_positions(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """World positions of the end-effector body frames, (n_ee, 3)."""
    fr = forward_kinematics(model, q)
    return fr.p[jnp.array(model.ee_body_idx)]


def ee_velocities(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """World linear velocities of the end-effector body frames, (n_ee, 3).

    Matches pinocchio getFrameVelocity(..., LOCAL_WORLD_ALIGNED).linear()
    used by the reference's EE velocity cost (derivatives.cpp:625-646).
    """
    fr = forward_kinematics(model, q)
    out = []
    for i, b in enumerate(model.ee_body_idx):
        J = point_jacobian(model, fr, b, fr.p[b])
        out.append(jnp.matmul(J, v, precision=HIGHEST))
    return jnp.stack(out)
