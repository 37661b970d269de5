"""Mosaic-safe dynamics step — complete round-2 Pallas-kernel groundwork.

The full semi-implicit step (FK → Jacobians → mass matrix → RNEA bias →
implicit contact → masked SPD solve → integrate) expressed exclusively with
operations that lower inside Pallas TPU kernels:

- quaternion-only rotation algebra (ops/quat_fk.py),
- one-hot matmuls for every tree gather/scatter (constant matrices),
- 2-D matmuls for M/τ assembly (per-body loop of (nv,3)@(3,nv) products),
- the masked Cholesky/substitution solve (ops/linalg.py).

No jnp fancy indexing with traced indices, no batched 3×3 matmuls, no
LAPACK custom calls, no jvp. Verified equal to engine.step in
tests/test_ops.py; the round-2 whole-rollout kernel lifts this body into a
single pl.pallas_call (the per-level/per-body python loops unroll at trace
time exactly as they do here).

Note: NOT for differentiated paths (see ops/linalg.py — the masked solve's
tangents are expensive); its target is plant rollouts and the line search.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.dynamics import math as qm
from mpc_ilqr_tpu.models.robot import JNT_FREE, RobotModel
from mpc_ilqr_tpu.ops.linalg import spd_solve
from mpc_ilqr_tpu.ops.quat_fk import LevelPlan, build_level_plans, quat_frames

HP = jax.lax.Precision.HIGHEST


class StepPlan(NamedTuple):
    """All constant matrices the Mosaic-safe step needs (numpy)."""

    levels: Tuple[LevelPlan, ...]
    dof_axis_src: np.ndarray  # (nv, B) one-hot: which body's frame gives dof axis
    dof_is_lin: np.ndarray  # (nv,) 1.0 translational
    dof_lin_axis: np.ndarray  # (nv, 3) world axis for translational dofs
    body_dof_onehot: np.ndarray  # (B, nv) one-hot of each body's own dof (hinge)
    anc: np.ndarray  # (B, nv) ancestor mask
    cp_body_onehot: np.ndarray  # (ncp, B)
    cp_anc: np.ndarray  # (ncp, nv)
    act_scatter: np.ndarray  # (nv, nu): tau = act_scatter @ (gear*u)
    qvel_to_qdot: None  # kinematics handled in integrate below
    free_body: int  # index of the free-joint body (root), -1 if none
    free_dof: int
    free_qpos: int


def build_step_plan(model: RobotModel) -> StepPlan:
    B, nv, nu = model.nbody, model.nv, model.nu
    dof_axis_src = np.zeros((nv, B))
    dof_is_lin = np.zeros(nv)
    dof_lin_axis = np.zeros((nv, 3))
    body_dof_onehot = np.zeros((B, nv))
    free_body = free_dof = free_qpos = -1
    for i in range(B):
        jt = model.body_jnt_type[i]
        d = model.body_dof_adr[i]
        if jt == JNT_FREE:
            free_body, free_dof, free_qpos = i, d, model.body_qpos_adr[i]
            for k in range(3):
                dof_is_lin[d + k] = 1.0
                dof_lin_axis[d + k, k] = 1.0
            for k in range(3):
                dof_axis_src[d + 3 + k, i] = 1.0  # axes = base frame columns
        elif jt == "hinge":
            dof_axis_src[d, i] = 1.0
            body_dof_onehot[i, d] = 1.0
    act_scatter = np.zeros((nv, nu))
    for a, d in enumerate(model.act_dof_adr):
        act_scatter[d, a] = 1.0
    ncp = model.ncp
    cp_onehot = np.zeros((ncp, B))
    for c, b in enumerate(model.cp_body_idx):
        cp_onehot[c, b] = 1.0
    return StepPlan(
        levels=build_level_plans(model),
        dof_axis_src=dof_axis_src,
        dof_is_lin=dof_is_lin,
        dof_lin_axis=dof_lin_axis,
        body_dof_onehot=body_dof_onehot,
        anc=np.asarray(model.ancestor_mask, dtype=np.float64),
        cp_body_onehot=cp_onehot,
        cp_anc=np.asarray(model.ancestor_mask)[list(model.cp_body_idx)],
        act_scatter=act_scatter,
        qvel_to_qdot=None,
        free_body=free_body,
        free_dof=free_dof,
        free_qpos=free_qpos,
    )


def _dof_frames(model: RobotModel, plan: StepPlan, Q, P, dt):
    """World dof axes W (nv,3) and anchors O (nv,3) via one-hot matmuls."""
    src = jnp.asarray(plan.dof_axis_src, dt)  # (nv, B)
    Qd = jnp.matmul(src, Q, precision=HP)  # quat of owning body per dof
    Pd = jnp.matmul(src, P, precision=HP)
    # Hinge axes rotate the model's body-frame axis; the free joint's three
    # angular dofs are the base-frame axes e_k (k per dof).
    axis_body = jnp.zeros((model.nv, 3), dt)
    for i in range(model.nbody):
        if model.body_jnt_type[i] == "hinge":
            d = model.body_dof_adr[i]
            axis_body = axis_body.at[d].set(model.jnt_axis[i])
    if plan.free_body >= 0:
        d = plan.free_dof
        for k in range(3):
            axis_body = axis_body.at[d + 3 + k, k].set(1.0)
    W_rot = qm.quat_rotate(Qd, axis_body)
    lin = jnp.asarray(plan.dof_is_lin, dt)[:, None]
    W = lin * jnp.asarray(plan.dof_lin_axis, dt) + (1.0 - lin) * W_rot
    # Anchors: hinge anchor = body origin + R @ jnt_pos; free angular = base pos.
    jpos = jnp.zeros((model.nv, 3), dt)
    for i in range(model.nbody):
        if model.body_jnt_type[i] == "hinge":
            jpos = jpos.at[model.body_dof_adr[i]].set(model.jnt_pos[i])
    O = Pd + qm.quat_rotate(Qd, jpos)
    return W, O


def step_mosaic(model: RobotModel, plan: StepPlan, x: jnp.ndarray, u: jnp.ndarray,
                n_substeps: int = 1) -> jnp.ndarray:
    """engine.step, Mosaic-safe formulation. Same numbers (f32 round-off)."""
    h = model.timestep / n_substeps
    dt = x.dtype
    nv, B = model.nv, model.nbody

    def substep(x):
        q = x[: model.nq]
        v = x[model.nq :]
        if plan.free_qpos >= 0:
            a = plan.free_qpos
            q = q.at[a + 3 : a + 7].set(qm.quat_normalize(q[a + 3 : a + 7]))
        Q, P = quat_frames(model, plan.levels, q)
        W, O = _dof_frames(model, plan, Q, P, dt)

        # Per-body CoM points and Jacobians (B, nv, 3) via masked cross products
        pc = P + qm.quat_rotate(Q, model.body_ipos)
        anc = jnp.asarray(plan.anc, dt)
        lin = jnp.asarray(plan.dof_is_lin, dt)
        diff = pc[:, None, :] - O[None, :, :]  # (B, nv, 3)
        rot_cols = jnp.cross(jnp.broadcast_to(W[None], diff.shape), diff)
        colsv = (lin[None, :, None] * W[None] + (1 - lin)[None, :, None] * rot_cols)
        colsv = colsv * anc[:, :, None]  # (B, nv, 3) linear Jacobian columns
        colsw = ((1 - lin)[None, :, None] * W[None]) * anc[:, :, None]

        # omega per body: (B,3) = sum_k colsw[b,k,:] v_k
        omega = jnp.einsum("bkc,k->bc", colsw, v, precision=HP)
        vc = jnp.einsum("bkc,k->bc", colsv, v, precision=HP)

        # Mass matrix: loop bodies, 2-D matmuls only.
        M = jnp.diag(model.dof_armature.astype(dt))
        # RNEA accelerations (alpha, a_c) — level recursion with one-hot ops
        alpha = jnp.zeros((B, 3), dt)
        a_c = jnp.zeros((B, 3), dt)
        for pl_ in plan.levels:
            gi = jnp.asarray(pl_.body_idx)
            if pl_.kind == "free":
                i = int(pl_.body_idx[0])
                r = pc[i] - P[i]
                a_c = a_c.at[i].set(jnp.cross(omega[i], jnp.cross(omega[i], r)))
                continue
            gp = jnp.asarray(pl_.gather_parent, dt)
            sc = jnp.asarray(pl_.scatter_child, dt)
            om_p = jnp.matmul(gp, omega, precision=HP)
            al_p = jnp.matmul(gp, alpha, precision=HP)
            pc_p = jnp.matmul(gp, pc, precision=HP)
            ac_p = jnp.matmul(gp, a_c, precision=HP)
            if pl_.kind == "hinge":
                # joint rate per child: one-hot over dofs
                dof_sel = jnp.asarray(
                    np.stack([plan.body_dof_onehot[i] for i in pl_.body_idx]), dt
                )  # (g, nv)
                qd_g = jnp.matmul(dof_sel, v, precision=HP)[:, None]
                w_g = jnp.matmul(dof_sel, W, precision=HP)
                o_g = jnp.matmul(dof_sel, O, precision=HP)
                al_i = al_p + jnp.cross(om_p, w_g) * qd_g
            else:
                o_g = pc_p
                al_i = al_p
            om_i = jnp.matmul(jnp.asarray(np.eye(B)[pl_.body_idx], dt), omega, precision=HP)
            r_o = o_g - pc_p
            a_o = ac_p + jnp.cross(al_p, r_o) + jnp.cross(om_p, jnp.cross(om_p, r_o))
            pc_g = jnp.matmul(jnp.asarray(np.eye(B)[pl_.body_idx], dt), pc, precision=HP)
            r_c = pc_g - o_g
            a_ci = a_o + jnp.cross(al_i, r_c) + jnp.cross(om_i, jnp.cross(om_i, r_c))
            alpha = alpha + jnp.matmul(sc, al_i, precision=HP)
            a_c = a_c + jnp.matmul(sc, a_ci, precision=HP)

        # Inertia terms without 3x3 matrices: rotate into the inertial frame.
        Qin = qm.quat_mul(Q, model.body_iquat)  # body CoM frame quats (B,4)
        Idiag = model.body_inertia.astype(dt)
        Iw_omega = qm.quat_rotate(Qin, Idiag * qm.quat_rotate_inv(Qin, omega))
        n_body = (
            qm.quat_rotate(Qin, Idiag * qm.quat_rotate_inv(Qin, alpha))
            + jnp.cross(omega, Iw_omega)
        )
        f_body = model.body_mass[:, None].astype(dt) * (a_c - model.gravity[None, :].astype(dt))
        bias = jnp.einsum("bkc,bc->k", colsv, f_body, precision=HP) + jnp.einsum(
            "bkc,bc->k", colsw, n_body, precision=HP
        )

        # M = sum_b m_b Jv_bT Jv_b + Jw_bT Iw_b Jw_b: per-body 2-D matmuls.
        for b in range(B):
            Jv_b = colsv[b].T  # (3, nv)
            M = M + model.body_mass[b].astype(dt) * jnp.matmul(Jv_b.T, Jv_b, precision=HP)
            Jw_b = colsw[b]  # (nv, 3) columns as rows
            IwJw = qm.quat_rotate(Qin[b], Idiag[b] * qm.quat_rotate_inv(Qin[b], Jw_b))
            M = M + jnp.matmul(Jw_b, IwJw.T, precision=HP)

        # Contact (same implicit scheme as engine.contact_terms)
        tau = jnp.matmul(jnp.asarray(plan.act_scatter, dt), model.act_gear.astype(dt) * u,
                         precision=HP)
        lhs = M + h * jnp.diag(model.dof_damping.astype(dt))
        if model.ncp:
            cb = jnp.asarray(plan.cp_body_onehot, dt)
            Qc = jnp.matmul(cb, Q, precision=HP)
            Pc = jnp.matmul(cb, P, precision=HP)
            pw = Pc + qm.quat_rotate(Qc, model.cp_pos.astype(dt))
            canc = jnp.asarray(plan.cp_anc, dt)
            diffc = pw[:, None, :] - O[None, :, :]
            rotc = jnp.cross(jnp.broadcast_to(W[None], diffc.shape), diffc)
            colc = (lin[None, :, None] * W[None] + (1 - lin)[None, :, None] * rotc)
            colc = colc * canc[:, :, None]  # (ncp, nv, 3)
            vel = jnp.einsum("nkc,k->nc", colc, v, precision=HP)
            depth = -pw[:, 2]
            active = jnp.where(depth > 0.0, 1.0, 0.0).astype(dt)
            fn_el = model.contact_stiffness.astype(dt) * depth * active
            vt = vel[:, :2]
            vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-6)
            ct = model.contact_friction.astype(dt) * fn_el / vt_norm
            cn = model.contact_damping.astype(dt) + h * model.contact_stiffness.astype(dt)
            c_diag = jnp.stack([ct, ct, jnp.broadcast_to(cn, ct.shape)], -1) * active[:, None]
            lhs = lhs + h * jnp.einsum("nkc,nc,nlc->kl", colc, c_diag, colc, precision=HP)
            f_el = jnp.concatenate([jnp.zeros_like(vt), fn_el[:, None]], -1)
            tau = tau + jnp.einsum("nkc,nc->k", colc, f_el, precision=HP)

        rhs = jnp.matmul(M, v, precision=HP) + h * (tau - bias)
        v_next = spd_solve(lhs, rhs)

        # Integrate
        qn = q
        if plan.free_qpos >= 0:
            a, d = plan.free_qpos, plan.free_dof
            qn = qn.at[a : a + 3].add(h * v_next[d : d + 3])
            qn = qn.at[a + 3 : a + 7].set(
                qm.quat_integrate(q[a + 3 : a + 7], v_next[d + 3 : d + 6], h)
            )
        for i in range(B):
            if model.body_jnt_type[i] == "hinge":
                qn = qn.at[model.body_qpos_adr[i]].add(h * v_next[model.body_dof_adr[i]])
        return jnp.concatenate([qn, v_next])

    out = x
    for _ in range(n_substeps):
        out = substep(out)
    return out
