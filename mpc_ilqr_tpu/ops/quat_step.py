"""Mosaic-safe dynamics step — complete round-2 Pallas-kernel groundwork.

The full semi-implicit step (FK → Jacobians → mass matrix → RNEA bias →
implicit contact → masked SPD solve → integrate) expressed exclusively with
operations that lower inside Pallas TPU kernels:

- quaternion-only rotation algebra,
- one-hot matmuls for every tree gather/scatter (constant matrices,
  precomputed in build_step_plan — the step body never touches numpy),
- 2-D matmuls for M/τ assembly (per-body loop of (nv,3)@(3,nv) products),
- the masked Cholesky/substitution solve (ops/linalg.py).

No traced-index gathers, no batched 3×3 matmuls, no LAPACK custom calls,
no jvp, no value scatters. Verified equal to engine.step in
tests/test_ops.py. Every array in StepPlan is part of an array pytree
(`plan_arrays`) so it can be passed as a pallas_call input (see
ops/rollout_kernel.py); only kinds/free-joint addresses stay python.

Note: NOT for differentiated paths (see ops/linalg.py — the masked solve's
tangents are expensive); its target is plant rollouts and the line search.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.dynamics import math as qm
from mpc_ilqr_tpu.dynamics.kinematics import _tree_levels
from mpc_ilqr_tpu.models.robot import JNT_FREE, JNT_HINGE, RobotModel
from mpc_ilqr_tpu.ops.linalg import spd_solve

HP = jax.lax.Precision.HIGHEST


def _eye(n, dt):
    """Identity without a captured constant (iota comparison)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dt)


class LevelArrays(NamedTuple):
    """Per-level constant matrices (pytree of arrays)."""

    gather_parent: np.ndarray  # (g, B)
    child_sel: np.ndarray  # (g, B) selects the children's rows
    scatter_child: np.ndarray  # (B, g)
    qsel: np.ndarray  # (g, nq) hinge angle selector
    dof_sel: np.ndarray  # (g, nv) hinge dof selector
    root_rows: np.ndarray  # (g, 1) 1.0 where the parent is the world


class StepPlan(NamedTuple):
    """Arrays (pallas-input-able pytree) + static metadata for the step."""

    levels: Tuple[LevelArrays, ...]
    hinge_sel: np.ndarray  # (nv, B): hinge dof row -> owning body
    dof_axis_src: np.ndarray  # (nv, B): body whose frame orients the dof
    dof_free_ang_axis: np.ndarray  # (nv, 3): e_k rows at free angular dofs
    dof_is_lin: np.ndarray  # (nv,)
    dof_lin_axis: np.ndarray  # (nv, 3)
    anc: np.ndarray  # (B, nv)
    cp_onehot: np.ndarray  # (ncp, B)
    cp_anc: np.ndarray  # (ncp, nv)
    act_scatter: np.ndarray  # (nv, nu)
    qpos_from_dof: np.ndarray  # (nq, nv): linear qpos update map (hinges +
    # free translation; quaternion rows zero)
    root_scatter: np.ndarray  # (B, 1) one-hot of the free root (zeros if none)
    # --- static (never a kernel input) ---
    levels_static: Tuple[str, ...]  # per-level kind
    free_qpos: int
    free_dof: int


def build_step_plan(model: RobotModel) -> StepPlan:
    B, nv, nq, nu = model.nbody, model.nv, model.nq, model.nu
    unsupported = set(model.body_jnt_type) - {"free", "hinge", "fixed"}
    if unsupported:
        raise NotImplementedError(
            f"pallas step plan supports free/hinge/fixed joints only (model "
            f"has {sorted(unsupported)}); use rollout_backend='xla'"
        )
    levels = []
    kinds = []
    for lv in _tree_levels(model.body_parent, model.body_jnt_type):
        free, hinge, fixed = lv.get("free", ()), lv.get("hinge", ()), lv.get("fixed", ())
        for kind, group in (("free", free), ("hinge", hinge), ("fixed", fixed)):
            if not group:
                continue
            g = len(group)
            gp = np.zeros((g, B))
            cs = np.zeros((g, B))
            sc = np.zeros((B, g))
            qs = np.zeros((g, nq))
            ds = np.zeros((g, nv))
            rr = np.zeros((g, 1))
            for r, i in enumerate(group):
                p = model.body_parent[i]
                if p >= 0:
                    gp[r, p] = 1.0
                else:
                    rr[r, 0] = 1.0  # world-rooted: parent quat is identity
                cs[r, i] = 1.0
                sc[i, r] = 1.0
                if kind == "hinge":
                    qs[r, model.body_qpos_adr[i]] = 1.0
                    ds[r, model.body_dof_adr[i]] = 1.0
            levels.append(LevelArrays(gp, cs, sc, qs, ds, rr))
            kinds.append(kind)

    hinge_sel = np.zeros((nv, B))
    dof_axis_src = np.zeros((nv, B))
    dof_free_ang_axis = np.zeros((nv, 3))
    dof_is_lin = np.zeros(nv)
    dof_lin_axis = np.zeros((nv, 3))
    qpos_from_dof = np.zeros((nq, nv))
    root_scatter = np.zeros((B, 1))
    free_qpos = free_dof = -1
    for i in range(B):
        jt = model.body_jnt_type[i]
        d = model.body_dof_adr[i]
        if jt == JNT_FREE:
            a = model.body_qpos_adr[i]
            free_qpos, free_dof = a, d
            root_scatter[i, 0] = 1.0
            for k in range(3):
                dof_is_lin[d + k] = 1.0
                dof_lin_axis[d + k, k] = 1.0
                qpos_from_dof[a + k, d + k] = 1.0
            for k in range(3):
                dof_axis_src[d + 3 + k, i] = 1.0
                dof_free_ang_axis[d + 3 + k, k] = 1.0
        elif jt == JNT_HINGE:
            hinge_sel[d, i] = 1.0
            dof_axis_src[d, i] = 1.0
            qpos_from_dof[model.body_qpos_adr[i], d] = 1.0

    act_scatter = np.zeros((nv, nu))
    for a, d in enumerate(model.act_dof_adr):
        act_scatter[d, a] = 1.0
    cp_onehot = np.zeros((model.ncp, B))
    for c, b in enumerate(model.cp_body_idx):
        cp_onehot[c, b] = 1.0

    return StepPlan(
        levels=tuple(levels),
        hinge_sel=hinge_sel,
        dof_axis_src=dof_axis_src,
        dof_free_ang_axis=dof_free_ang_axis,
        dof_is_lin=dof_is_lin,
        dof_lin_axis=dof_lin_axis,
        anc=np.asarray(model.ancestor_mask, dtype=np.float64),
        cp_onehot=cp_onehot,
        cp_anc=np.asarray(model.ancestor_mask)[list(model.cp_body_idx)],
        act_scatter=act_scatter,
        qpos_from_dof=qpos_from_dof,
        root_scatter=root_scatter,
        levels_static=tuple(kinds),
        free_qpos=free_qpos,
        free_dof=free_dof,
    )


def plan_arrays(plan: StepPlan):
    """The plan's array pytree (everything a pallas_call can take as input)."""
    return (tuple(plan.levels), plan.hinge_sel, plan.dof_axis_src,
            plan.dof_free_ang_axis, plan.dof_is_lin, plan.dof_lin_axis,
            plan.anc, plan.cp_onehot, plan.cp_anc, plan.act_scatter,
            plan.qpos_from_dof, plan.root_scatter)


def plan_with_arrays(plan: StepPlan, arrays) -> StepPlan:
    """Rebuild a StepPlan whose array leaves are the given (e.g. in-kernel
    ref-loaded) values, keeping the static metadata."""
    (levels, hinge_sel, dof_axis_src, dof_free_ang_axis, dof_is_lin,
     dof_lin_axis, anc, cp_onehot, cp_anc, act_scatter, qpos_from_dof,
     root_scatter) = arrays
    return StepPlan(
        levels=tuple(LevelArrays(*l) for l in levels),
        hinge_sel=hinge_sel, dof_axis_src=dof_axis_src,
        dof_free_ang_axis=dof_free_ang_axis, dof_is_lin=dof_is_lin,
        dof_lin_axis=dof_lin_axis, anc=anc, cp_onehot=cp_onehot,
        cp_anc=cp_anc, act_scatter=act_scatter, qpos_from_dof=qpos_from_dof,
        root_scatter=root_scatter, levels_static=plan.levels_static,
        free_qpos=plan.free_qpos, free_dof=plan.free_dof,
    )


def _quat_frames(model, plan: StepPlan, q, dt):
    """World body quats (B,4) / positions (B,3), one-hot composition."""
    B = model.body_pos.shape[0]
    Q = jnp.zeros((B, 4), dt)
    P = jnp.zeros((B, 3), dt)
    for kind, lv in zip(plan.levels_static, plan.levels):
        if kind == "free":
            a = plan.free_qpos
            rs = jnp.asarray(plan.root_scatter, dt)  # (B,1)
            Q = Q + jnp.matmul(rs, qm.quat_normalize(q[a + 3 : a + 7])[None, :], precision=HP)
            P = P + jnp.matmul(rs, q[a : a + 3][None, :], precision=HP)
            continue
        gp = jnp.asarray(lv.gather_parent, dt)
        cs = jnp.asarray(lv.child_sel, dt)
        sc = jnp.asarray(lv.scatter_child, dt)
        # World-rooted rows gather all-zero parents; add the identity quat
        # (iota-built, no captured constant) so quat_mul composes correctly.
        rr = jnp.asarray(lv.root_rows, dt)
        e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1) == 0).astype(dt)
        Qp = jnp.matmul(gp, Q, precision=HP) + jnp.matmul(rr, e0, precision=HP)
        Pp = jnp.matmul(gp, P, precision=HP)
        Qb = jnp.matmul(cs, model.body_quat.astype(dt), precision=HP)
        Pb = jnp.matmul(cs, model.body_pos.astype(dt), precision=HP)
        Pi = Pp + qm.quat_rotate(Qp, Pb)
        Qi = qm.quat_mul(Qp, Qb)
        if kind == "hinge":
            th = jnp.matmul(jnp.asarray(lv.qsel, dt), q, precision=HP)
            ax = jnp.matmul(cs, model.jnt_axis.astype(dt), precision=HP)
            jp = jnp.matmul(cs, model.jnt_pos.astype(dt), precision=HP)
            Qj = qm.quat_axis_angle(ax, th)
            Pi = Pi + qm.quat_rotate(Qi, jp - qm.quat_rotate(Qj, jp))
            Qi = qm.quat_mul(Qi, Qj)
        Q = Q + jnp.matmul(sc, Qi, precision=HP)
        P = P + jnp.matmul(sc, Pi, precision=HP)
    return Q, P


def step_mosaic(model: RobotModel, plan: StepPlan, x: jnp.ndarray, u: jnp.ndarray,
                n_substeps: int = 1) -> jnp.ndarray:
    """engine.step, Mosaic-safe formulation. Same numbers (round-off)."""
    nq = model.nq
    h = model.timestep / n_substeps
    dt = x.dtype
    B = model.nbody

    def substep(x):
        q = x[:nq]
        v = x[nq:]
        if plan.free_qpos >= 0:  # normalize the base quaternion (engine parity)
            a = plan.free_qpos
            q = jnp.concatenate(
                [q[: a + 3], qm.quat_normalize(q[a + 3 : a + 7]), q[a + 7 :]]
            )
        Q, P = _quat_frames(model, plan, q, dt)

        # Per-dof world frames via one-hot matmuls.
        src = jnp.asarray(plan.dof_axis_src, dt)
        Qd = jnp.matmul(src, Q, precision=HP)
        Pd = jnp.matmul(src, P, precision=HP)
        hs = jnp.asarray(plan.hinge_sel, dt)
        axis_body = jnp.matmul(hs, model.jnt_axis.astype(dt), precision=HP) + jnp.asarray(
            plan.dof_free_ang_axis, dt
        )
        lin = jnp.asarray(plan.dof_is_lin, dt)
        W = lin[:, None] * jnp.asarray(plan.dof_lin_axis, dt) + (1 - lin)[:, None] * qm.quat_rotate(
            Qd, axis_body
        )
        O = Pd + qm.quat_rotate(Qd, jnp.matmul(hs, model.jnt_pos.astype(dt), precision=HP))

        # Jacobian columns (B, nv, 3), masked cross products.
        pc = P + qm.quat_rotate(Q, model.body_ipos.astype(dt))
        anc = jnp.asarray(plan.anc, dt)
        diff = pc[:, None, :] - O[None, :, :]
        rot_cols = qm.cross(jnp.broadcast_to(W[None], diff.shape), diff)
        colsv = (lin[None, :, None] * W[None] + (1 - lin)[None, :, None] * rot_cols) * anc[:, :, None]
        colsw = ((1 - lin)[None, :, None] * W[None]) * anc[:, :, None]

        # omega[b] = colsw[b]^T-style contraction, as B small 2-D matmuls
        # (Mosaic supports only 2-D dots).
        omega = jnp.concatenate(
            [jnp.matmul(v[None, :], colsw[b], precision=HP) for b in range(B)], axis=0
        )  # (B, 3)

        # RNEA accelerations: level recursion, one-hot gathers/scatters.
        alpha = jnp.zeros((B, 3), dt)
        a_c = jnp.zeros((B, 3), dt)
        for kind, lv in zip(plan.levels_static, plan.levels):
            cs = jnp.asarray(lv.child_sel, dt)
            sc = jnp.asarray(lv.scatter_child, dt)
            if kind == "free":
                om_r = jnp.matmul(cs, omega, precision=HP)  # (1,3)
                r = jnp.matmul(cs, pc - P, precision=HP)
                acr = qm.cross(om_r, qm.cross(om_r, r))
                a_c = a_c + jnp.matmul(sc, acr, precision=HP)
                continue
            gp = jnp.asarray(lv.gather_parent, dt)
            om_p = jnp.matmul(gp, omega, precision=HP)
            al_p = jnp.matmul(gp, alpha, precision=HP)
            pc_p = jnp.matmul(gp, pc, precision=HP)
            ac_p = jnp.matmul(gp, a_c, precision=HP)
            if kind == "hinge":
                ds = jnp.asarray(lv.dof_sel, dt)
                qd_g = jnp.matmul(ds, v, precision=HP)[:, None]
                w_g = jnp.matmul(ds, W, precision=HP)
                o_g = jnp.matmul(ds, O, precision=HP)
                al_i = al_p + qm.cross(om_p, w_g) * qd_g
            else:
                o_g = pc_p
                al_i = al_p
            om_i = jnp.matmul(cs, omega, precision=HP)
            r_o = o_g - pc_p
            a_o = ac_p + qm.cross(al_p, r_o) + qm.cross(om_p, qm.cross(om_p, r_o))
            pc_g = jnp.matmul(cs, pc, precision=HP)
            r_c = pc_g - o_g
            a_ci = a_o + qm.cross(al_i, r_c) + qm.cross(om_i, qm.cross(om_i, r_c))
            alpha = alpha + jnp.matmul(sc, al_i, precision=HP)
            a_c = a_c + jnp.matmul(sc, a_ci, precision=HP)

        # Inertia terms without 3x3 matrices (rotate through inertial frame).
        Qin = qm.quat_mul(Q, model.body_iquat.astype(dt))
        Idiag = model.body_inertia.astype(dt)
        Iw_omega = qm.quat_rotate(Qin, Idiag * qm.quat_rotate_inv(Qin, omega))
        n_body = qm.quat_rotate(Qin, Idiag * qm.quat_rotate_inv(Qin, alpha)) + qm.cross(
            omega, Iw_omega
        )
        f_body = model.body_mass[:, None].astype(dt) * (
            a_c - model.gravity[None, :].astype(dt)
        )
        # COLUMN-form accumulation, kept 2-D all the way to the solve:
        # integer-squeezing a size-1 LANE axis ([:, 0]) trips a Mosaic
        # layout assert (bisected on hardware, round 2) — the one safe
        # column->vector conversion is transpose + sublane-0 index (.T[0]),
        # applied once after the velocity solve below.
        bias = jnp.zeros((model.nv, 1), dt)
        for b in range(B):
            bias = bias + jnp.matmul(colsv[b], f_body[b][:, None], precision=HP)
            bias = bias + jnp.matmul(colsw[b], n_body[b][:, None], precision=HP)

        # Mass matrix: per-body 2-D matmuls (static slices of the columns).
        # The inertia rotation I_w @ Jw is vectorized over ALL bodies first;
        # per-body SCALAR quat algebra inside the loop does not lower, and
        # neither do (B,)->(B,1,1) leading broadcasts or implicit (B,1,4)
        # quat slices (Mosaic bisect, round 2) — hence the explicit
        # broadcast_to and the matmul-built (B,nv) mass table below.
        nv = model.nv
        Qin_bn = jnp.broadcast_to(Qin[:, None, :], (B, nv, 4))
        Idiag_bn = jnp.broadcast_to(Idiag[:, None, :], (B, nv, 3))
        IwJw_all = qm.quat_rotate(
            Qin_bn, Idiag_bn * qm.quat_rotate_inv(Qin_bn, colsw)
        )  # (B, nv, 3)
        ones_row = (jax.lax.broadcasted_iota(jnp.int32, (1, nv), 1) >= 0).astype(dt)
        mass_bn = jnp.matmul(
            model.body_mass.astype(dt)[:, None], ones_row, precision=HP
        )  # (B, nv)
        colsv_m = colsv * mass_bn[:, :, None]
        M = _eye(model.nv, dt) * model.dof_armature.astype(dt)[None, :]
        for b in range(B):
            M = M + jnp.matmul(colsv_m[b], colsv[b].T, precision=HP)
            M = M + jnp.matmul(colsw[b], IwJw_all[b].T, precision=HP)

        # Actuation + implicit contact (tau as a column, see bias note).
        tau = jnp.matmul(jnp.asarray(plan.act_scatter, dt),
                         (model.act_gear.astype(dt) * u)[:, None], precision=HP)
        lhs = M + h * _eye(model.nv, dt) * model.dof_damping.astype(dt)[None, :]
        if plan.cp_onehot.shape[0]:
            cb = jnp.asarray(plan.cp_onehot, dt)
            Qc = jnp.matmul(cb, Q, precision=HP)
            Pc = jnp.matmul(cb, P, precision=HP)
            pw = Pc + qm.quat_rotate(Qc, model.cp_pos.astype(dt))
            canc = jnp.asarray(plan.cp_anc, dt)
            diffc = pw[:, None, :] - O[None, :, :]
            rotc = qm.cross(jnp.broadcast_to(W[None], diffc.shape), diffc)
            colc = (lin[None, :, None] * W[None] + (1 - lin)[None, :, None] * rotc) * canc[:, :, None]
            ncp = plan.cp_onehot.shape[0]
            vel = jnp.concatenate(
                [jnp.matmul(v[None, :], colc[n], precision=HP) for n in range(ncp)], axis=0
            )  # (ncp, 3)
            depth = model.cp_radius.astype(dt) - pw[:, 2]
            active = jnp.where(depth > 0.0, 1.0, 0.0).astype(dt)
            fn_el = model.contact_stiffness.astype(dt) * depth * active
            vt = vel[:, :2]
            # impratio sharpens stiction (engine.contact_terms parity)
            eps_f = 1e-6 / jnp.maximum(model.contact_impratio.astype(dt), 1e-3)
            vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + eps_f)
            ct = model.contact_friction.astype(dt) * fn_el / vt_norm
            cn = model.contact_damping.astype(dt) + h * model.contact_stiffness.astype(dt)
            c_diag = jnp.stack([ct, ct, jnp.broadcast_to(cn, ct.shape)], -1) * active[:, None]
            f_el = jnp.concatenate([jnp.zeros_like(vt), fn_el[:, None]], -1)
            tau_c = jnp.zeros((model.nv, 1), dt)  # column (see bias note)
            for n in range(ncp):
                Jc = colc[n] * c_diag[n][None, :]  # (nv, 3)
                lhs = lhs + h * jnp.matmul(Jc, colc[n].T, precision=HP)
                tau_c = tau_c + jnp.matmul(colc[n], f_el[n][:, None], precision=HP)
            tau = tau + tau_c

        rhs = jnp.matmul(M, v[:, None], precision=HP) + h * (tau - bias)  # (nv,1)
        from mpc_ilqr_tpu.ops.linalg import cholesky_masked, solve_tri_masked

        L = cholesky_masked(lhs)
        v_next_col = solve_tri_masked(L, rhs)  # (nv, 1), never lane-squeezed
        v_next = v_next_col.T[0]  # Mosaic-safe: transpose + sublane-0 index

        # Integrate: linear map for hinges + free translation; quaternion
        # handled with static slices and concatenation (no value scatter).
        qn_col = q[:, None] + h * jnp.matmul(
            jnp.asarray(plan.qpos_from_dof, dt), v_next_col, precision=HP
        )
        qn = qn_col.T[0]
        if plan.free_qpos >= 0:
            a, d = plan.free_qpos, plan.free_dof
            quat = qm.quat_integrate(q[a + 3 : a + 7], v_next[d + 3 : d + 6], h)
            qn = jnp.concatenate([qn[: a + 3], quat, qn[a + 7 :]])
        return jnp.concatenate([qn, v_next])

    out = x
    for _ in range(n_substeps):
        out = substep(out)
    return out
