"""Forward kinematics, Jacobians, CoM — pure JAX, batched-friendly.

Replaces mj_forward-side kinematics plus every Pinocchio/CasADi kinematic
quantity the reference consumes: body poses (mj_jacBody targets,
robot_utils.cpp:393-410), subtree CoM (mj_jacSubtreeCom,
robot_utils.cpp:383-391), frame velocities (pinocchio getFrameVelocity
LOCAL_WORLD_ALIGNED, derivatives.cpp:625-646), and the mass-weighted CoM
(robot_utils.cpp:810-833). Everything is differentiable, so jax.grad /
jax.hessian replace the CasADi symbolic gradient/Hessian factory.

TPU-first structure: the kinematic tree is processed per depth LEVEL, not per
body — each level is one batch of 3×3 matmuls/rotations over all bodies at
that depth (H1: 20 bodies → 7 levels). This keeps the traced graph small
(fast XLA compiles) and the work VPU-batched; under vmap the leading batch
axis multiplies straight through.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Small ill-conditioned chains + Cholesky downstream: TPU's default bf16
# matmul precision is not enough. Pin full f32 on every contraction.
HIGHEST = jax.lax.Precision.HIGHEST

from mpc_ilqr_tpu.dynamics import math as qm
from mpc_ilqr_tpu.models.robot import (
    JNT_BALL,
    JNT_FIXED,
    JNT_FREE,
    JNT_HINGE,
    JNT_SLIDE,
    RobotModel,
)


class KinFrames(NamedTuple):
    """World-frame kinematic data for one configuration q."""

    R: jnp.ndarray  # (B, 3, 3) body orientations
    p: jnp.ndarray  # (B, 3) body frame origins
    dof_axis: jnp.ndarray  # (nv, 3) world axis of each dof
    dof_anchor: jnp.ndarray  # (nv, 3) world anchor point of rotational dofs
    dof_linear: jnp.ndarray  # (nv,) 1.0 for translational dofs


@functools.lru_cache(maxsize=32)
def _tree_levels(body_parent: tuple, body_jnt_type: tuple):
    """Static schedule: bodies grouped by tree depth, split by joint type.

    Returns a list (one entry per depth level) of dicts
    {joint_type: tuple(body indices)}; only types present at a level appear.
    """
    B = len(body_parent)
    depth = [0] * B
    for i in range(B):
        depth[i] = 0 if body_parent[i] < 0 else depth[body_parent[i]] + 1
    levels = []
    for d in range(max(depth) + 1):
        idx = [i for i in range(B) if depth[i] == d]
        lv = {}
        for jt in (JNT_FREE, JNT_BALL, JNT_HINGE, JNT_SLIDE, JNT_FIXED):
            grp = tuple(i for i in idx if body_jnt_type[i] == jt)
            if grp:
                lv[jt] = grp
        levels.append(lv)
    return levels


def forward_kinematics(model: RobotModel, q: jnp.ndarray) -> KinFrames:
    """Level-batched FK: world poses of all bodies + per-dof axes/anchors.

    Handles free/ball/hinge/slide/fixed joints (one per body — multi-joint
    MJCF bodies are split into chains at load time, models/robot.py).
    """
    B, nv = model.nbody, model.nv
    dt = q.dtype
    R = jnp.zeros((B, 3, 3), dt)
    p = jnp.zeros((B, 3), dt)
    W = jnp.zeros((nv, 3), dt)  # dof world axes
    O = jnp.zeros((nv, 3), dt)  # dof anchors
    lin = np.zeros(nv)

    parent = np.asarray(model.body_parent)
    qadr = np.asarray(model.body_qpos_adr)
    dadr = np.asarray(model.body_dof_adr)

    for level in _tree_levels(model.body_parent, model.body_jnt_type):
        for i in level.get(JNT_FREE, ()):  # free roots are rare; scalar path
            a, d = qadr[i], dadr[i]
            quat = qm.quat_normalize(q[a + 3 : a + 7])
            Ri = qm.quat_to_mat(quat)
            pi = q[a : a + 3]
            R = R.at[i].set(Ri)
            p = p.at[i].set(pi)
            W = W.at[d : d + 3].set(jnp.eye(3, dtype=dt))
            lin[d : d + 3] = 1.0
            W = W.at[d + 3 : d + 6].set(Ri.T)  # columns of R = body axes in world
            O = O.at[d + 3 : d + 6].set(jnp.broadcast_to(pi, (3, 3)))

        for jt in (JNT_BALL, JNT_HINGE, JNT_SLIDE, JNT_FIXED):
            group = level.get(jt, ())
            if not group:
                continue
            gi = np.array(group)
            par = parent[gi]
            # World-rooted bodies (parent = -1): the parent frame is the
            # world (R = I, p = 0), NOT a wrapped -1 gather.
            root = jnp.asarray((par < 0).astype(np.float64), dt)
            par_safe = jnp.asarray(np.maximum(par, 0))
            Rp = R[par_safe] * (1.0 - root)[:, None, None] + jnp.eye(3, dtype=dt)[
                None
            ] * root[:, None, None]
            pp = p[par_safe] * (1.0 - root)[:, None]
            Rb = qm.quat_to_mat(model.body_quat[gi])
            Ri = jnp.matmul(Rp, Rb, precision=HIGHEST)
            pi = pp + jnp.einsum("gij,gj->gi", Rp, model.body_pos[gi], precision=HIGHEST)
            if jt in (JNT_HINGE, JNT_BALL):
                jp = model.jnt_pos[gi]
                if jt == JNT_HINGE:
                    ja = jnp.asarray(qadr[gi])
                    ax = model.jnt_axis[gi]
                    Rj = qm.quat_to_mat(qm.quat_axis_angle(ax, q[ja]))
                else:  # ball: quaternion coordinate, rotation about jnt_pos
                    ja = np.asarray(qadr[gi])
                    quat_g = q[jnp.asarray(ja)[:, None] + np.arange(4)[None, :]]
                    norm = jnp.sqrt(jnp.sum(quat_g * quat_g, axis=-1, keepdims=True))
                    Rj = qm.quat_to_mat(quat_g / jnp.maximum(norm, 1e-12))
                # X_child = X_prejoint * Trans(jp) * Rot * Trans(-jp)
                pi = pi + jnp.einsum(
                    "gij,gj->gi", Ri, jp - jnp.einsum("gij,gj->gi", Rj, jp, precision=HIGHEST),
                    precision=HIGHEST,
                )
                Ri = jnp.matmul(Ri, Rj, precision=HIGHEST)
                anchor = pi + jnp.einsum("gij,gj->gi", Ri, jp, precision=HIGHEST)
                da = np.asarray(dadr[gi])
                if jt == JNT_HINGE:
                    w = jnp.einsum("gij,gj->gi", Ri, model.jnt_axis[gi], precision=HIGHEST)
                    W = W.at[da].set(w)
                    O = O.at[da].set(anchor)
                else:
                    # Ball angular velocity is expressed in the CHILD frame
                    # (like the free joint): dof axes = columns of R_child.
                    da3 = da[:, None] + np.arange(3)[None, :]
                    W = W.at[da3.reshape(-1)].set(
                        jnp.swapaxes(Ri, -1, -2).reshape(-1, 3)
                    )
                    O = O.at[da3.reshape(-1)].set(
                        jnp.repeat(anchor, 3, axis=0)
                    )
            elif jt == JNT_SLIDE:
                ja = jnp.asarray(qadr[gi])
                ax = model.jnt_axis[gi]
                pi = pi + jnp.einsum("gij,gj->gi", Ri, ax, precision=HIGHEST) * q[ja][:, None]
                da = np.asarray(dadr[gi])
                w = jnp.einsum("gij,gj->gi", Ri, ax, precision=HIGHEST)
                W = W.at[da].set(w)
                lin[da] = 1.0
            R = R.at[gi].set(Ri)
            p = p.at[gi].set(pi)

    return KinFrames(R=R, p=p, dof_axis=W, dof_anchor=O, dof_linear=jnp.asarray(lin, dt))


def point_jacobian(model: RobotModel, fr: KinFrames, body_idx: int, point_w: jnp.ndarray):
    """Linear-velocity Jacobian (3, nv) of a world-frame point on body_idx."""
    mask = model.ancestor_mask[body_idx]  # (nv,)
    lin = fr.dof_linear[:, None]
    rot_cols = jnp.cross(fr.dof_axis, point_w[None, :] - fr.dof_anchor)
    cols = lin * fr.dof_axis + (1.0 - lin) * rot_cols  # (nv, 3)
    return (cols * mask[:, None]).T


def point_jacobians(model: RobotModel, fr: KinFrames, body_idx, points_w: jnp.ndarray):
    """Batched linear Jacobians (n, 3, nv) for points on bodies `body_idx`
    (static index array) at world positions points_w (n, 3)."""
    mask = model.ancestor_mask[jnp.asarray(body_idx)]  # (n, nv)
    lin = fr.dof_linear
    diff = points_w[:, None, :] - fr.dof_anchor[None, :, :]  # (n, nv, 3)
    rot = jnp.cross(jnp.broadcast_to(fr.dof_axis, diff.shape), diff)
    cols = lin[None, :, None] * fr.dof_axis[None] + (1.0 - lin)[None, :, None] * rot
    return jnp.swapaxes(cols * mask[:, :, None], -1, -2)  # (n, 3, nv)


def body_jacobians(model: RobotModel, fr: KinFrames, points_w: jnp.ndarray):
    """Point Jacobians for one point per body: Jv, Jw each (B, 3, nv)."""
    Jv = point_jacobians(model, fr, np.arange(model.nbody), points_w)
    lin = fr.dof_linear
    cols_w = (1.0 - lin)[None, :, None] * fr.dof_axis[None] * model.ancestor_mask[:, :, None]
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
    """Angular velocity and CoM linear velocity of every body (world frame)."""
    pc = body_com_positions(model, fr)
    Jv, Jw = body_jacobians(model, fr, pc)
    om = jnp.einsum("bij,j->bi", Jw, v, precision=HIGHEST)
    vc = jnp.einsum("bij,j->bi", Jv, v, precision=HIGHEST)
    return om, vc


def com_velocity(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    fr = forward_kinematics(model, q)
    _, vc = body_velocities(model, fr, v)
    m = model.body_mass
    return (m[:, None] * vc).sum(0) / m.sum()


def ee_positions(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """World positions of the end-effector body frames, (n_ee, 3)."""
    fr = forward_kinematics(model, q)
    return fr.p[jnp.asarray(model.ee_body_idx)]


def ee_velocities(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """World linear velocities of the end-effector body frames, (n_ee, 3).

    Matches pinocchio getFrameVelocity(..., LOCAL_WORLD_ALIGNED).linear()
    used by the reference's EE velocity cost (derivatives.cpp:625-646).
    """
    fr = forward_kinematics(model, q)
    idx = np.asarray(model.ee_body_idx)
    J = point_jacobians(model, fr, idx, fr.p[jnp.asarray(idx)])
    return jnp.einsum("eij,j->ei", J, v, precision=HIGHEST)


class TaskFeatures(NamedTuple):
    """All kinematic quantities the task costs consume — ONE FK + one
    Jacobian set (the reference recomputes kinematics per cost family)."""

    com: jnp.ndarray  # (3,)
    com_vel: jnp.ndarray  # (3,)
    ee_pos: jnp.ndarray  # (n_ee, 3)
    ee_vel: jnp.ndarray  # (n_ee, 3)


def task_features(model: RobotModel, x: jnp.ndarray) -> TaskFeatures:
    q, v = model.split_state(x)
    fr = forward_kinematics(model, q)
    pc = body_com_positions(model, fr)
    m = model.body_mass
    msum = m.sum()
    com = (m[:, None] * pc).sum(0) / msum
    Jv, _ = body_jacobians(model, fr, pc)
    vc = jnp.einsum("bij,j->bi", Jv, v, precision=HIGHEST)
    com_vel = (m[:, None] * vc).sum(0) / msum
    if model.n_ee:
        idx = np.asarray(model.ee_body_idx)
        pw = fr.p[jnp.asarray(idx)]
        Je = point_jacobians(model, fr, idx, pw)
        ee_vel = jnp.einsum("eij,j->ei", Je, v, precision=HIGHEST)
    else:
        pw = jnp.zeros((0, 3), x.dtype)
        ee_vel = jnp.zeros((0, 3), x.dtype)
    return TaskFeatures(com=com, com_vel=com_vel, ee_pos=pw, ee_vel=ee_vel)
