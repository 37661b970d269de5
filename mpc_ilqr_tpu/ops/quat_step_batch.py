"""Batched Mosaic-safe dynamics step: ALL line-search alphas in one program.

The per-alpha Pallas grid in ops/rollout_kernel.py SERIALIZES on a TPU core
(grid steps share the single compute unit), so the 8-alpha line search there
costs 8 sequential N-step chains. This module batches the alphas *inside*
the step instead, so ONE kernel program advances all A candidate rollouts
per timestep — the serial chain length stays N, not A·N.

Design (every op stays inside the Mosaic lowering classes already proven on
hardware by ops/quat_step.py — see the rule list in ops/rollout_kernel.py):

- **Folded row layout.** Per-alpha quantities stack along the sublane axis:
  body frames are (A·B, 4)/(A·B, 3), dof frames (A·nv, 3), with row a·B+b =
  (alpha a, body b). All quaternion algebra (dynamics/math.py) is rank-2
  row-wise and unchanged.
- **kron(I_A, ·) gather/scatter constants.** Every one-hot tree gather from
  the StepPlan becomes its A-fold block-diagonal kron, precomputed in numpy
  (BatchPlan): gathers stay plain 2-D matmuls.
- **Component-form Jacobians.** The (B, nv, 3) Jacobian column tensors
  become three 2-D matrices (x/y/z components) of shape (A·B, A·nv), masked
  by kron(I_A, ancestor_mask) so cross-alpha entries are exactly zero. The
  per-body contraction loops of the unbatched step then collapse into THREE
  2-D matmuls over the full folded axes — e.g. the mass matrix is
      M_fold = Σ_c colsv_m_c^T @ colsv_c   (block-diagonal by construction)
  which feeds the MXU instead of 2·B tiny per-body products.
- **Rank-3 batched masked solve.** The per-alpha (nv, nv) systems extract
  from the block-diagonal lhs with static slices and solve with a batched
  column-by-column masked Cholesky (concatenation updates, no scatters; the
  transposed factor is built simultaneously from the symmetric Schur
  complement, so the back-substitution needs no in-kernel transpose).

Numerics are identical to ops/quat_step.step_mosaic row-for-row (pinned by
tests/test_ops_batch.py against vmap(step_mosaic) in f64).

Reference parity: the closed-loop law this feeds is ilqr.cpp:334-336; the
step itself mirrors engine.step (see ops/quat_step.py for the per-term
citations).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.dynamics import math as qm
from mpc_ilqr_tpu.models.robot import RobotModel
from mpc_ilqr_tpu.ops.quat_step import StepPlan, _eye

HP = jax.lax.Precision.HIGHEST


class BatchLevel(NamedTuple):
    """A-fold constants for one kinematic-tree level (all (…)-shaped numpy)."""

    gpA: np.ndarray  # (A·g, A·B) kron(I_A, gather_parent)
    csA: np.ndarray  # (A·g, A·B) kron(I_A, child_sel) — gathers per-alpha rows
    scA: np.ndarray  # (A·B, A·g) kron(I_A, scatter_child)
    qselA: np.ndarray  # (A·g, A·nq) kron(I_A, qsel)
    dsA: np.ndarray  # (A·g, A·nv) kron(I_A, dof_sel)
    rrT: np.ndarray  # (A·g, 1) tiled root rows
    tcs: np.ndarray  # (A·g, B) tile(child_sel): gathers body CONSTANTS


class BatchPlan(NamedTuple):
    """kron/tile constants for an A-wide batched step (pallas-input pytree)."""

    levels: Tuple[BatchLevel, ...]
    srcA: np.ndarray  # (A·nv, A·B) kron(I_A, dof_axis_src)
    hsT: np.ndarray  # (A·nv, B) tile(hinge_sel): gathers jnt constants per dof
    freeaxA: np.ndarray  # (A·nv, 3) tile(dof_free_ang_axis)
    linA: np.ndarray  # (A·nv, 1) tile(dof_is_lin)
    linaxA: np.ndarray  # (A·nv, 3) tile(dof_lin_axis)
    ancA: np.ndarray  # (A·B, A·nv) kron(I_A, ancestor_mask) — the alpha-block mask
    cpA: np.ndarray  # (A·ncp, A·B) kron(I_A, cp_onehot)
    cancA: np.ndarray  # (A·ncp, A·nv) kron(I_A, cp_anc)
    actA: np.ndarray  # (A·nv, A·nu) kron(I_A, act_scatter)
    rsA: np.ndarray  # (A·B, A) kron(I_A, root_scatter): scatters per-alpha base
    qfdT: np.ndarray  # (nv, nq) qpos_from_dof.T (right-multiplied, no fold)
    tile_B: np.ndarray  # (A·B, B) folds per-body model constants
    tile_nv: np.ndarray  # (A·nv, nv)
    tile_nu: np.ndarray  # (A·nu, nu)
    tile_ncp: np.ndarray  # (A·ncp, ncp)
    # --- static ---
    A: int


def build_batch_plan(plan: StepPlan, A: int) -> BatchPlan:
    """Precompute the A-fold kron/tile constants from a StepPlan (numpy)."""
    I = np.eye(A)
    ones = np.ones((A, 1))
    kron = np.kron
    levels = tuple(
        BatchLevel(
            gpA=kron(I, lv.gather_parent),
            csA=kron(I, lv.child_sel),
            scA=kron(I, lv.scatter_child),
            qselA=kron(I, lv.qsel),
            dsA=kron(I, lv.dof_sel),
            rrT=kron(ones, lv.root_rows),
            tcs=kron(ones, lv.child_sel),
        )
        for lv in plan.levels
    )
    nv = plan.hinge_sel.shape[0]
    B = plan.hinge_sel.shape[1]
    nu = plan.act_scatter.shape[1]
    ncp = plan.cp_onehot.shape[0]
    return BatchPlan(
        levels=levels,
        srcA=kron(I, plan.dof_axis_src),
        hsT=kron(ones, plan.hinge_sel),
        freeaxA=kron(ones, plan.dof_free_ang_axis),
        linA=kron(ones, np.asarray(plan.dof_is_lin)[:, None]),
        linaxA=kron(ones, plan.dof_lin_axis),
        ancA=kron(I, plan.anc),
        cpA=kron(I, plan.cp_onehot),
        cancA=kron(I, plan.cp_anc),
        actA=kron(I, plan.act_scatter),
        rsA=kron(I, plan.root_scatter),
        qfdT=np.asarray(plan.qpos_from_dof).T,
        tile_B=kron(ones, np.eye(B)),
        tile_nv=kron(ones, np.eye(nv)),
        tile_nu=kron(ones, np.eye(nu)),
        tile_ncp=kron(ones, np.eye(ncp)) if ncp else np.zeros((0, 0)),
        A=A,
    )


def batch_plan_arrays(bp: BatchPlan):
    """Array pytree of the batch plan (everything a pallas_call can take)."""
    return (tuple(bp.levels), bp.srcA, bp.hsT, bp.freeaxA, bp.linA, bp.linaxA,
            bp.ancA, bp.cpA, bp.cancA, bp.actA, bp.rsA, bp.qfdT,
            bp.tile_B, bp.tile_nv, bp.tile_nu, bp.tile_ncp)


def batch_plan_with_arrays(bp: BatchPlan, arrays) -> BatchPlan:
    (levels, srcA, hsT, freeaxA, linA, linaxA, ancA, cpA, cancA, actA, rsA,
     qfdT, tile_B, tile_nv, tile_nu, tile_ncp) = arrays
    return BatchPlan(
        levels=tuple(BatchLevel(*l) for l in levels),
        srcA=srcA, hsT=hsT, freeaxA=freeaxA, linA=linA, linaxA=linaxA,
        ancA=ancA, cpA=cpA, cancA=cancA, actA=actA, rsA=rsA, qfdT=qfdT,
        tile_B=tile_B, tile_nv=tile_nv, tile_nu=tile_nu, tile_ncp=tile_ncp,
        A=bp.A,
    )


def _fold_col(M: jnp.ndarray) -> jnp.ndarray:
    """(A, n) -> (A·n, 1) column (vec-by-rows), as masked matmuls.

    Mosaic-safe form (hardware A/B, round 4): the previous
    concat-of-row-slices gave each piece a distinct vector offset
    ({a, a·n}) and tpu.concatenate refuses the relayout ("result/input
    offset mismatch on non-concat dimension"). Two matmuls against
    iota-built 0/1 masks produce the same fold with every operand at
    offset {0,0}: rep[r, :] = M[r//n, :], then row r dots the e_{r%n}
    basis column. Exact in f32 (0/1 weights), ~A²n² MACs — noise next to
    the dynamics matmuls.
    """
    A, n = M.shape
    dt = M.dtype
    r_blk = jax.lax.broadcasted_iota(jnp.int32, (A * n, A), 0) // n
    a_lane = jax.lax.broadcasted_iota(jnp.int32, (A * n, A), 1)
    r_el = jax.lax.broadcasted_iota(jnp.int32, (A * n, n), 0) % n
    j_lane = jax.lax.broadcasted_iota(jnp.int32, (A * n, n), 1)
    R = (r_blk == a_lane).astype(dt)      # (A·n, A): row r selects alpha r//n
    T = (r_el == j_lane).astype(dt)       # (A·n, n): row r selects element r%n
    rep = jnp.matmul(R, M, precision=HP)  # (A·n, n): row r = M[r//n, :]
    return jnp.matmul(rep * T, jnp.ones((n, 1), dt), precision=HP)


def _rot_cols(q: jnp.ndarray, vx, vy, vz, inv: bool = False):
    """Rotate per-row 3-vectors spread over lanes: q (R,4), v* (R,J) 2-D.

    Component form of qm.quat_rotate for the folded Jacobian layout (the
    3-axis lives across three 2-D arrays, not a trailing dim)."""
    w = q[:, 0:1]
    s = -1.0 if inv else 1.0
    ux, uy, uz = s * q[:, 1:2], s * q[:, 2:3], s * q[:, 3:4]
    cx = uy * vz - uz * vy
    cy = uz * vx - ux * vz
    cz = ux * vy - uy * vx
    ccx = uy * cz - uz * cy
    ccy = uz * cx - ux * cz
    ccz = ux * cy - uy * cx
    return (vx + 2.0 * (w * cx + ccx),
            vy + 2.0 * (w * cy + ccy),
            vz + 2.0 * (w * cz + ccz))


def cholesky_masked_batch(S: jnp.ndarray):
    """Batched masked Cholesky of SPD (A, n, n): returns (L, Lᵀ).

    Column-by-column right-looking factorization with concatenation updates
    (rank-3 outer-product Schur complement; no scatters, no lane squeezes).
    Lᵀ is built from the symmetric complement's ROWS, so the back-
    substitution downstream needs no in-kernel transpose."""
    n = S.shape[-1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    colsL = []
    rowsLT = []
    for k in range(n):
        col = S[:, :, k : k + 1]  # (A, n, 1)
        row = S[:, k : k + 1, :]  # (A, 1, n) — S stays symmetric
        inv = jax.lax.rsqrt(S[:, k : k + 1, k : k + 1])
        lk = jnp.where(sub >= k, col * inv, 0.0)
        lkT = jnp.where(lane >= k, row * inv, 0.0)
        colsL.append(lk)
        rowsLT.append(lkT)
        S = S - lk * lkT
    return jnp.concatenate(colsL, axis=2), jnp.concatenate(rowsLT, axis=1)


def solve_tri_batch(L: jnp.ndarray, LT: jnp.ndarray, b_row: jnp.ndarray):
    """Solve (L Lᵀ) x = b batched, b_row (A, 1, n) row layout -> (A, 1, n).

    Forward/backward substitution with lane-concatenation updates; every
    dot is an elementwise product + lane reduction (VPU), sized (A, 1, n)."""
    n = L.shape[-1]

    def set_lane(M, piece, k):
        parts = ([piece] if k == 0 else [M[:, :, :k], piece])
        if k < n - 1:
            parts.append(M[:, :, k + 1 :])
        return jnp.concatenate(parts, axis=2)

    y = jnp.zeros_like(b_row)
    for k in range(n):  # forward: y[i>=k] still zero -> sum hits i<k only
        acc = jnp.sum(L[:, k : k + 1, :] * y, axis=2, keepdims=True)
        yk = (b_row[:, :, k : k + 1] - acc) / L[:, k : k + 1, k : k + 1]
        y = set_lane(y, yk, k)
    x = jnp.zeros_like(b_row)
    for i in range(n):  # backward over Lᵀ rows
        k = n - 1 - i
        acc = jnp.sum(LT[:, k : k + 1, :] * x, axis=2, keepdims=True)
        xk = (y[:, :, k : k + 1] - acc) / LT[:, k : k + 1, k : k + 1]
        x = set_lane(x, xk, k)
    return x


def _quat_frames_batch(model: RobotModel, plan: StepPlan, bp: BatchPlan,
                       q2d: jnp.ndarray, q_fold: jnp.ndarray, dt):
    """World frames for all alphas: Q (A·B, 4), P (A·B, 3), folded rows."""
    A, B = bp.A, model.nbody
    Q = jnp.zeros((A * B, 4), dt)
    P = jnp.zeros((A * B, 3), dt)
    e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1) == 0).astype(dt)
    for kind, blv in zip(plan.levels_static, bp.levels):
        if kind == "free":
            a = plan.free_qpos
            rsA = jnp.asarray(bp.rsA, dt)
            Q = Q + jnp.matmul(rsA, qm.quat_normalize(q2d[:, a + 3 : a + 7]), precision=HP)
            P = P + jnp.matmul(rsA, q2d[:, a : a + 3], precision=HP)
            continue
        gpA = jnp.asarray(blv.gpA, dt)
        csA = jnp.asarray(blv.csA, dt)
        scA = jnp.asarray(blv.scA, dt)
        tcs = jnp.asarray(blv.tcs, dt)
        rrT = jnp.asarray(blv.rrT, dt)
        Qp = jnp.matmul(gpA, Q, precision=HP) + jnp.matmul(rrT, e0, precision=HP)
        Pp = jnp.matmul(gpA, P, precision=HP)
        Qb = jnp.matmul(tcs, model.body_quat.astype(dt), precision=HP)
        Pb = jnp.matmul(tcs, model.body_pos.astype(dt), precision=HP)
        Pi = Pp + qm.quat_rotate(Qp, Pb)
        Qi = qm.quat_mul(Qp, Qb)
        if kind == "hinge":
            th = jnp.matmul(jnp.asarray(blv.qselA, dt), q_fold, precision=HP).T[0]
            ax = jnp.matmul(tcs, model.jnt_axis.astype(dt), precision=HP)
            jp = jnp.matmul(tcs, model.jnt_pos.astype(dt), precision=HP)
            Qj = qm.quat_axis_angle(ax, th)
            Pi = Pi + qm.quat_rotate(Qi, jp - qm.quat_rotate(Qj, jp))
            Qi = qm.quat_mul(Qi, Qj)
        Q = Q + jnp.matmul(scA, Qi, precision=HP)
        P = P + jnp.matmul(scA, Pi, precision=HP)
    return Q, P


def step_mosaic_batch(model: RobotModel, plan: StepPlan, bp: BatchPlan,
                      X: jnp.ndarray, U: jnp.ndarray,
                      n_substeps: int = 1) -> jnp.ndarray:
    """A-wide batched engine.step: X (A, nx), U (A, nu) -> (A, nx).

    Row a advances with control U[a] — exactly vmap(step_mosaic) (pinned in
    tests/test_ops_batch.py) but expressed in folded 2-D component form so
    the whole batch lowers inside ONE Pallas program (see module docstring).
    """
    nq, nv, B, A = model.nq, model.nv, model.nbody, bp.A
    h = model.timestep / n_substeps
    dt = X.dtype

    def substep(X):
        q = X[:, :nq]
        v = X[:, nq:]
        if plan.free_qpos >= 0:
            a = plan.free_qpos
            q = jnp.concatenate(
                [q[:, : a + 3], qm.quat_normalize(q[:, a + 3 : a + 7]), q[:, a + 7 :]],
                axis=1,
            )
        q_fold = _fold_col(q)  # (A·nq, 1)
        v_fold = _fold_col(v)  # (A·nv, 1)
        u_fold = _fold_col(U)  # (A·nu, 1)

        Q, P = _quat_frames_batch(model, plan, bp, q, q_fold, dt)

        # Per-dof world frames (A·nv rows).
        srcA = jnp.asarray(bp.srcA, dt)
        hsT = jnp.asarray(bp.hsT, dt)
        Qd = jnp.matmul(srcA, Q, precision=HP)
        Pd = jnp.matmul(srcA, P, precision=HP)
        axis_body = jnp.matmul(hsT, model.jnt_axis.astype(dt), precision=HP) + jnp.asarray(
            bp.freeaxA, dt
        )
        linc = jnp.asarray(bp.linA, dt)  # (A·nv, 1)
        W = linc * jnp.asarray(bp.linaxA, dt) + (1 - linc) * qm.quat_rotate(Qd, axis_body)
        O = Pd + qm.quat_rotate(Qd, jnp.matmul(hsT, model.jnt_pos.astype(dt), precision=HP))

        # Folded model constants.
        tile_B = jnp.asarray(bp.tile_B, dt)
        mass_f = jnp.matmul(tile_B, model.body_mass.astype(dt)[:, None], precision=HP)
        ipos_f = jnp.matmul(tile_B, model.body_ipos.astype(dt), precision=HP)
        iquat_f = jnp.matmul(tile_B, model.body_iquat.astype(dt), precision=HP)
        inert_f = jnp.matmul(tile_B, model.body_inertia.astype(dt), precision=HP)
        pc = P + qm.quat_rotate(Q, ipos_f)  # (A·B, 3)

        # Component-form Jacobian columns: three (A·B, A·nv) matrices, with
        # kron(I_A, ancestor_mask) zeroing every cross-alpha entry — the sums
        # below then contract over FULL folded axes and stay exact.
        lin_r = linc.T  # (1, A·nv)
        rot_r = 1 - lin_r
        Wr = [W[:, c : c + 1].T for c in range(3)]  # (1, A·nv) each
        Or = [O[:, c : c + 1].T for c in range(3)]
        ancA = jnp.asarray(bp.ancA, dt)

        def jac_cols(points, mask):  # points (R, 3) -> 3 × (R, A·nv)
            d = [points[:, c : c + 1] - Or[c] for c in range(3)]
            rx = Wr[1] * d[2] - Wr[2] * d[1]
            ry = Wr[2] * d[0] - Wr[0] * d[2]
            rz = Wr[0] * d[1] - Wr[1] * d[0]
            cv = [(lin_r * Wr[c] + rot_r * r) * mask for c, r in enumerate((rx, ry, rz))]
            return cv

        colsv = jac_cols(pc, ancA)
        colsw = [(rot_r * Wr[c]) * ancA for c in range(3)]

        omega = jnp.concatenate(
            [jnp.matmul(colsw[c], v_fold, precision=HP) for c in range(3)], axis=1
        )  # (A·B, 3)

        # RNEA level recursion on folded rows (same math as step_mosaic).
        alpha_acc = jnp.zeros((A * B, 3), dt)
        a_c = jnp.zeros((A * B, 3), dt)
        for kind, blv in zip(plan.levels_static, bp.levels):
            csA = jnp.asarray(blv.csA, dt)
            scA = jnp.asarray(blv.scA, dt)
            if kind == "free":
                om_r = jnp.matmul(csA, omega, precision=HP)
                r = jnp.matmul(csA, pc - P, precision=HP)
                acr = qm.cross(om_r, qm.cross(om_r, r))
                a_c = a_c + jnp.matmul(scA, acr, precision=HP)
                continue
            gpA = jnp.asarray(blv.gpA, dt)
            om_p = jnp.matmul(gpA, omega, precision=HP)
            al_p = jnp.matmul(gpA, alpha_acc, precision=HP)
            pc_p = jnp.matmul(gpA, pc, precision=HP)
            ac_p = jnp.matmul(gpA, a_c, precision=HP)
            if kind == "hinge":
                dsA = jnp.asarray(blv.dsA, dt)
                qd_g = jnp.matmul(dsA, v_fold, precision=HP)  # (A·g, 1)
                w_g = jnp.matmul(dsA, W, precision=HP)
                o_g = jnp.matmul(dsA, O, precision=HP)
                al_i = al_p + qm.cross(om_p, w_g) * qd_g
            else:
                o_g = pc_p
                al_i = al_p
            om_i = jnp.matmul(csA, omega, precision=HP)
            r_o = o_g - pc_p
            a_o = ac_p + qm.cross(al_p, r_o) + qm.cross(om_p, qm.cross(om_p, r_o))
            pc_g = jnp.matmul(csA, pc, precision=HP)
            r_c = pc_g - o_g
            a_ci = a_o + qm.cross(al_i, r_c) + qm.cross(om_i, qm.cross(om_i, r_c))
            alpha_acc = alpha_acc + jnp.matmul(scA, al_i, precision=HP)
            a_c = a_c + jnp.matmul(scA, a_ci, precision=HP)

        # Bias forces (rank-2 quaternion algebra, folded rows).
        Qin = qm.quat_mul(Q, iquat_f)
        Iw_omega = qm.quat_rotate(Qin, inert_f * qm.quat_rotate_inv(Qin, omega))
        n_body = qm.quat_rotate(Qin, inert_f * qm.quat_rotate_inv(Qin, alpha_acc)) + qm.cross(
            omega, Iw_omega
        )
        f_body = mass_f * (a_c - model.gravity[None, :].astype(dt))
        bias = jnp.zeros((A * nv, 1), dt)
        for c in range(3):
            bias = bias + jnp.matmul(colsv[c].T, f_body[:, c : c + 1], precision=HP)
            bias = bias + jnp.matmul(colsw[c].T, n_body[:, c : c + 1], precision=HP)

        # Mass matrix: the per-body congruence loops collapse into 3+3 full
        # folded matmuls (block-diagonal M by the ancA masking).
        IwJw = _rot_cols(Qin, *_scale3(inert_f, _rot_cols(Qin, *colsw, inv=True)))
        tile_nv = jnp.asarray(bp.tile_nv, dt)
        arm_f = jnp.matmul(tile_nv, model.dof_armature.astype(dt)[:, None], precision=HP)
        damp_f = jnp.matmul(tile_nv, model.dof_damping.astype(dt)[:, None], precision=HP)
        M = _eye(A * nv, dt) * arm_f
        for c in range(3):
            M = M + jnp.matmul((mass_f * colsv[c]).T, colsv[c], precision=HP)
            M = M + jnp.matmul(colsw[c].T, IwJw[c], precision=HP)

        # Actuation + implicit contact.
        tile_nu = jnp.asarray(bp.tile_nu, dt)
        gear_f = jnp.matmul(tile_nu, model.act_gear.astype(dt)[:, None], precision=HP)
        tau = jnp.matmul(jnp.asarray(bp.actA, dt), gear_f * u_fold, precision=HP)
        lhs = M + h * _eye(A * nv, dt) * damp_f
        ncp = plan.cp_onehot.shape[0]
        if ncp:
            cpA = jnp.asarray(bp.cpA, dt)
            Qc = jnp.matmul(cpA, Q, precision=HP)
            Pc = jnp.matmul(cpA, P, precision=HP)
            tile_ncp = jnp.asarray(bp.tile_ncp, dt)
            cp_pos_f = jnp.matmul(tile_ncp, model.cp_pos.astype(dt), precision=HP)
            cp_rad_f = jnp.matmul(tile_ncp, model.cp_radius.astype(dt)[:, None], precision=HP)
            pw = Pc + qm.quat_rotate(Qc, cp_pos_f)  # (A·ncp, 3)
            colc = jac_cols(pw, jnp.asarray(bp.cancA, dt))
            vel = [jnp.matmul(colc[c], v_fold, precision=HP) for c in range(3)]
            depth = cp_rad_f - pw[:, 2:3]
            active = jnp.where(depth > 0.0, 1.0, 0.0).astype(dt)
            fn_el = model.contact_stiffness.astype(dt) * depth * active
            eps_f = 1e-6 / jnp.maximum(model.contact_impratio.astype(dt), 1e-3)
            vtn = jnp.sqrt(vel[0] * vel[0] + vel[1] * vel[1] + eps_f)
            ct = model.contact_friction.astype(dt) * fn_el / vtn
            cn = model.contact_damping.astype(dt) + h * model.contact_stiffness.astype(dt)
            cd = [ct * active, ct * active, (jnp.zeros_like(ct) + cn) * active]
            for c in range(3):
                lhs = lhs + h * jnp.matmul((colc[c] * cd[c]).T, colc[c], precision=HP)
            tau = tau + jnp.matmul(colc[2].T, fn_el, precision=HP)

        rhs = jnp.matmul(M, v_fold, precision=HP) + h * (tau - bias)  # (A·nv, 1)

        # Per-alpha block extraction (static slices) + batched masked solve.
        S = jnp.concatenate(
            [lhs[a * nv : (a + 1) * nv, a * nv : (a + 1) * nv][None] for a in range(A)],
            axis=0,
        )  # (A, nv, nv)
        b_row = jnp.concatenate(
            [rhs[a * nv : (a + 1) * nv, :].T[None] for a in range(A)], axis=0
        )  # (A, 1, nv)
        L, LT = cholesky_masked_batch(S)
        v_next = solve_tri_batch(L, LT, b_row)[:, 0, :]  # (A, nv) sublane-0

        qn = q + h * jnp.matmul(v_next, jnp.asarray(bp.qfdT, dt), precision=HP)
        if plan.free_qpos >= 0:
            a, d = plan.free_qpos, plan.free_dof
            quat = qm.quat_integrate(q[:, a + 3 : a + 7], v_next[:, d + 3 : d + 6], h)
            qn = jnp.concatenate([qn[:, : a + 3], quat, qn[:, a + 7 :]], axis=1)
        return jnp.concatenate([qn, v_next], axis=1)

    out = X
    for _ in range(n_substeps):
        out = substep(out)
    return out


def _scale3(s_col, v3):
    """Scale a 3-component tuple of (R, J) arrays by per-row (R, 3) factors."""
    return tuple(s_col[:, c : c + 1] * v3[c] for c in range(3))
