#!/usr/bin/env python3
"""Numpy+MuJoCo oracle of the reference's step-0 iLQR solve.

Settles the 16.27-vs-0.91 cost-parity question (BASELINE.md: the reference
README publishes `Step 0/15 | Cost: 16.27` for the stock config) by
re-implementing the C++ pipeline against the same MuJoCo physics it used:

  - config.cpp:66-122        buildCostMatrices (Q/R/Qf diagonals)
  - robot_utils.cpp:557-596  initializeStandingPose (z=1.0432, solver opts)
  - robot_utils.cpp:281-420  loadReferences (CoM/EE tracks via mj_forward)
  - robot_utils.cpp:445-504  contact schedule + isStance (out-of-bounds=stance)
  - robot_utils.cpp:106-160  rolloutOneStep / linearizeDynamicsFD (eps=1e-5)
  - robot_utils.cpp:615-778  constraint costs/grads/hessians (10% margins)
  - ilqr.cpp:50-117          cold-start init (gravity comp from qfrc_bias)
  - ilqr.cpp:133-244         cost quadraticization + task-cost injection
  - ilqr.cpp:250-309         Riccati backward pass (LLT check, LDLT solves)
  - ilqr.cpp:311-361         first-accept line search over 8 alphas
  - ilqr.cpp:363-518         computeTotalCost (tracking+upright+balance+limits
                             ONLY — the CoM/EE task costs shape the
                             quadratics but are NOT in the line-search cost)
  - ilqr.cpp:521-660         outer loop (λ policy, tol 1e-4, give-up, 1e6)

Task-cost derivatives: the C++ uses CasADi exact grad/hess (derivatives.cpp).
Here gradients are exact-to-FD (eps 1e-6 central differences through
mj_forward quantities) and Hessians are Gauss-Newton (w JᵀJ); this changes
the descent direction slightly, not the cost function being minimized —
documented in PARITY.md.

Everything indexes references the way the C++ does, including the quirk
that isStance/getEEReference/getCoMVelReference take the LOCAL window index
(ilqr.cpp:703, 707) so the task references never advance with t_idx.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import mujoco
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALPHAS = (1.0, 0.8, 0.6, 0.4, 0.2, 0.1, 0.05, 0.01)


def build_cost_matrices(w: dict, nx: int, nu: int, nq: int):
    """config.cpp:66-122."""
    Q = np.ones(nx)
    Q[0], Q[1], Q[2] = w["Q_position_x"], w["Q_position_y"], w["Q_position_z"]
    Q[3] = w["Q_quat_w"]
    Q[4:7] = w["Q_quat_xyz"]
    Q[7:nq] = w["Q_joint_pos"]
    Q[nq + 0], Q[nq + 1], Q[nq + 2] = w["Q_vel_x"], w["Q_vel_y"], w["Q_vel_z"]
    Q[nq + 3 : nq + 6] = w["Q_ang_vel"]
    Q[nq + 6 :] = w["Q_joint_vel"]
    R = np.full(nu, w["R_control"])
    Qf = Q * w["Qf_multiplier"]
    Qf[0] *= w["Qf_position_x"]
    Qf[1] *= w["Qf_position_y"]
    Qf[2] *= w["Qf_position_z"]
    Qf[nq + 2] *= w["Qf_vel_z"]
    return Q, R, Qf


@dataclass
class Oracle:
    scene_xml: str = os.path.join(ROOT, "robots/h1_description/mjcf/scene.xml")
    q_ref_csv: str = os.path.join(ROOT, "data/q_ref2_mj.csv")
    v_ref_csv: str = os.path.join(ROOT, "data/v_ref2.csv")
    contact_csv: str = os.path.join(ROOT, "data/contact_walking.csv")
    weights: dict = field(default_factory=dict)
    constraints: dict = field(default_factory=dict)
    gravity: tuple = (0.0, 0.0, -1.0)
    dt: float = 0.02
    impratio: float = 100.0
    N: int = 25

    def __post_init__(self):
        m = mujoco.MjModel.from_xml_path(self.scene_xml)
        m.opt.impratio = self.impratio  # robot_utils.cpp:58-63
        m.opt.timestep = self.dt
        m.opt.gravity[:] = self.gravity
        # initializeStandingPose solver opts (robot_utils.cpp:588-592)
        m.opt.cone = mujoco.mjtCone.mjCONE_ELLIPTIC
        m.opt.jacobian = mujoco.mjtJacobian.mjJAC_SPARSE
        m.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
        m.opt.iterations = 500
        m.opt.tolerance = 1e-8
        self.m = m
        self.d = mujoco.MjData(m)
        self.nq, self.nv, self.nu = m.nq, m.nv, m.nu
        self.nx = m.nq + m.nv
        self.Q, self.R, self.Qf = build_cost_matrices(
            self.weights, self.nx, self.nu, self.nq
        )
        self.w_joint = self.constraints["joint_limit_weight"]
        self.w_torque = self.constraints["torque_limit_weight"]
        self.w_com = self.weights["W_com_pos"]
        self.w_com_vel = self.weights["W_com_vel"]
        self.w_ee = self.weights["W_foot"]
        self.w_ee_vel = self.weights["W_foot_vel"]
        self.w_upright = self.weights["W_upright"]
        self.w_balance = self.weights["w_balance"]
        self.ee_bids = [
            mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, n)
            for n in ("left_ankle_link", "right_ankle_link")
        ]
        self._load_references()
        self._load_contacts()

    # --- reference loading (robot_utils.cpp:281-420) -----------------------
    def _load_references(self):
        q = np.loadtxt(self.q_ref_csv, delimiter=",")
        v = np.loadtxt(self.v_ref_csv, delimiter=",")
        T = min(len(q), len(v))
        self.x_ref_full = np.concatenate([q[:T], v[:T]], axis=1)
        self.u_ref_full = np.zeros((T, self.nu))
        com, com_vel, ee_pos, ee_vel = [], [], [], []
        d = mujoco.MjData(self.m)
        for t in range(T):
            d.qpos[:] = q[t]
            d.qvel[:] = v[t]
            mujoco.mj_forward(self.m, d)
            com.append(d.subtree_com[1].copy())  # body 1 subtree (cpp: idx 3+i)
            jac = np.zeros((3, self.nv))
            mujoco.mj_jacSubtreeCom(self.m, d, jac, 0)
            com_vel.append(jac @ v[t])
            ep, ev = [], []
            for bid in self.ee_bids:
                ep.append(d.xpos[bid].copy())
                jp = np.zeros((3, self.nv))
                jr = np.zeros((3, self.nv))
                mujoco.mj_jacBody(self.m, d, jp, jr, bid)
                ev.append(jp @ v[t])
            ee_pos.append(ep)
            ee_vel.append(ev)
        self.com_ref_full = np.asarray(com)
        self.com_vel_ref_full = np.asarray(com_vel)
        self.ee_pos_ref_full = np.asarray(ee_pos)  # (T, 2, 3)
        self.ee_vel_ref_full = np.asarray(ee_vel)

    def _load_contacts(self):
        rows = np.loadtxt(self.contact_csv, delimiter=",", skiprows=1, dtype=int)
        self.contact = rows  # (T, 2)

    def is_stance(self, ee_idx: int, t: int) -> bool:
        """robot_utils.cpp:494-504 (out-of-bounds default = stance)."""
        if t < 0 or t >= len(self.contact):
            return True
        return self.contact[t][ee_idx] == 1

    # --- dynamics (robot_utils.cpp:106-160) --------------------------------
    def rollout_one_step(self, x, u):
        d = self.d
        d.qpos[:] = x[: self.nq]
        d.qvel[:] = x[self.nq :]
        d.ctrl[:] = u
        mujoco.mj_forward(self.m, d)
        mujoco.mj_step(self.m, d)
        return np.concatenate([d.qpos.copy(), d.qvel.copy()])

    def linearize_fd(self, x, u, eps=1e-5):
        base = self.rollout_one_step(x, u)
        A = np.zeros((self.nx, self.nx))
        B = np.zeros((self.nx, self.nu))
        for i in range(self.nx):
            xp = x.copy()
            xp[i] += eps
            A[:, i] = (self.rollout_one_step(xp, u) - base) / eps
        for j in range(self.nu):
            up = u.copy()
            up[j] += eps
            B[:, j] = (self.rollout_one_step(x, up) - base) / eps
        return A, B

    def gravity_comp(self, x):
        """robot_utils.cpp:844-866: qfrc_bias at the actuators' qpos addr
        (note the reference indexes qfrc_bias by jnt_qposadr, a quirk kept)."""
        d = self.d
        d.qpos[:] = x[: self.nq]
        d.qvel[:] = x[self.nq :]
        mujoco.mj_forward(self.m, d)
        u = np.zeros(self.nu)
        for i in range(self.nu):
            jid = self.m.actuator_trnid[i, 0]
            adr = self.m.jnt_qposadr[jid]
            # The C++ indexes the nv-length qfrc_bias with qpos addresses
            # (7..25 on H1): every torque is one dof off and the last read
            # runs past the array (UB in C++). Emulate the shift; the OOB
            # element is unknowable, use 0 (PARITY.md "known deviations").
            u[i] = d.qfrc_bias[adr] if adr < self.nv else 0.0
        return u

    def standing_state(self):
        x = np.zeros(self.nx)
        x[2] = 1.0432
        x[3] = 1.0
        return x

    # --- kinematic quantities for costs -------------------------------------
    def com(self, x):
        """Mass-weighted xipos CoM (robot_utils.cpp:810-833)."""
        d = self.d
        d.qpos[:] = x[: self.nq]
        d.qvel[:] = x[self.nq :]
        mujoco.mj_forward(self.m, d)
        mass = self.m.body_mass[1:]
        return (mass[:, None] * d.xipos[1:]).sum(0) / mass.sum()

    def com_and_jac(self, x):
        d = self.d
        d.qpos[:] = x[: self.nq]
        d.qvel[:] = x[self.nq :]
        mujoco.mj_forward(self.m, d)
        jac = np.zeros((3, self.nv))
        mujoco.mj_jacSubtreeCom(self.m, d, jac, 0)
        mass = self.m.body_mass[1:]
        com = (mass[:, None] * d.xipos[1:]).sum(0) / mass.sum()
        return com, jac

    def ee_pos_and_jac(self, x, ee_idx):
        d = self.d
        d.qpos[:] = x[: self.nq]
        d.qvel[:] = x[self.nq :]
        mujoco.mj_forward(self.m, d)
        bid = self.ee_bids[ee_idx]
        jp = np.zeros((3, self.nv))
        jr = np.zeros((3, self.nv))
        mujoco.mj_jacBody(self.m, d, jp, jr, bid)
        return d.xpos[bid].copy(), jp

    # --- computeTotalCost (ilqr.cpp:363-518) --------------------------------
    def total_cost(self, xs, us, x_ref, u_ref, breakdown=False):
        terms = {"tracking": 0.0, "control": 0.0, "terminal": 0.0,
                 "upright": 0.0, "balance": 0.0, "constraints": 0.0}
        for t in range(self.N):
            xe = xs[t] - x_ref[t]
            ue = us[t] - u_ref[t]
            terms["tracking"] += 0.5 * xe @ (self.Q * xe)
            terms["control"] += 0.5 * ue @ (self.R * ue)
            if self.w_upright > 0:
                terms["upright"] += 0.5 * self.w_upright * self._upright_res(xs[t]) @ self._upright_res(xs[t])
            if self.w_balance > 0:
                terms["balance"] += self._balance_cost(xs[t], t)
        xe = xs[self.N] - x_ref[self.N]
        terms["terminal"] += 0.5 * xe @ (self.Qf * xe)
        if self.w_upright > 0:
            r = self._upright_res(xs[self.N])
            terms["upright"] += 0.5 * self.w_upright * r @ r
        if self.w_balance > 0:
            terms["balance"] += self._balance_cost(xs[self.N], self.N)
        for t in range(self.N):
            terms["constraints"] += self._constraint_cost(xs[t], us[t])
        terms["constraints"] += self._constraint_cost(xs[self.N], np.zeros(self.nu))
        total = sum(terms.values())
        return (total, terms) if breakdown else total

    def _upright_res(self, x):
        qw, qx, qy, qz = x[3:7]
        z_torso = np.array([
            2 * (qx * qz + qw * qy),
            2 * (qy * qz - qw * qx),
            1 - 2 * (qx * qx + qy * qy),
        ])
        return z_torso - np.array([0.0, 0.0, 1.0])

    def _support_center(self, t):
        ls, rs = self.is_stance(0, t), self.is_stance(1, t)
        if not (ls or rs):
            return None
        tt = min(t, len(self.ee_pos_ref_full) - 1)
        lf, rf = self.ee_pos_ref_full[tt]
        if ls and rs:
            return 0.5 * (lf[:2] + rf[:2])
        return lf[:2] if ls else rf[:2]

    def _balance_res(self, x, t):
        sup = self._support_center(t)
        if sup is None:
            return None
        p_com = self.com(x)
        v_com = x[self.nq : self.nq + 3]
        omega0 = np.sqrt(p_com[2] / 9.81)  # g hardcoded (ilqr.cpp:417)
        p_cp = p_com[:2] + v_com[:2] * omega0
        return p_cp - sup

    def _balance_cost(self, x, t):
        r = self._balance_res(x, t)
        return 0.0 if r is None else 0.5 * self.w_balance * r @ r

    def _constraint_cost(self, x, u):
        """robot_utils.cpp:615-672."""
        c = 0.0
        cr = self.m.actuator_ctrlrange
        for i in range(self.nu):
            margin = 0.1 * (cr[i, 1] - cr[i, 0])
            lo, hi = cr[i, 0] + margin, cr[i, 1] - margin
            if u[i] > hi:
                c += self.w_torque * (u[i] - hi) ** 2
            if u[i] < lo:
                c += self.w_torque * (lo - u[i]) ** 2
        for j in range(1, self.m.njnt):
            qi = self.m.jnt_qposadr[j]
            lo, hi = self.m.jnt_range[j]
            if np.isfinite(lo) and np.isfinite(hi) and lo < hi:
                margin = 0.1 * (hi - lo)
                los, his = lo + margin, hi - margin
                qv = x[qi]
                if qv > his:
                    c += self.w_joint * (qv - his) ** 2
                if qv < los:
                    c += self.w_joint * (los - qv) ** 2
        return c

    # --- cost quadratics (ilqr.cpp:133-244) ---------------------------------
    def _tangent_to_x(self, grad_v):
        """Velocity-space (nv) gradient rows -> raw-x rows. The free joint's
        quat block gets the angular rows mapped through the quat tangent
        (d quat = 0.5 * G(q)^T omega); joints map 1:1."""
        # For parity purposes we FD directly in raw x below instead.
        raise NotImplementedError

    def _fd_grad_raw(self, f, x, eps=1e-6):
        """Central-difference gradient of scalar/vector f w.r.t. raw x."""
        f0 = f(x)
        g = np.zeros((np.size(f0), self.nx))
        for i in range(self.nx):
            xp = x.copy(); xp[i] += eps
            xm = x.copy(); xm[i] -= eps
            g[:, i] = (np.atleast_1d(f(xp)) - np.atleast_1d(f(xm))) / (2 * eps)
        return g if np.size(f0) > 1 else g[0]

    def quadraticize(self, xs, us, x_ref, u_ref):
        N, nx, nu = self.N, self.nx, self.nu
        lx = np.zeros((N + 1, nx))
        lu = np.zeros((N, nu))
        lxx = np.zeros((N + 1, nx, nx))
        luu = np.zeros((N, nu, nu))
        for t in range(N + 1):
            xe = xs[t] - x_ref[t]
            if t < N:
                lx[t] = self.Q * xe
                lxx[t] = np.diag(self.Q)
                ue = us[t] - u_ref[t]
                lu[t] = self.R * ue
                luu[t] = np.diag(self.R)
            else:
                lx[t] = self.Qf * xe
                lxx[t] = np.diag(self.Qf)
            x, u = xs[t], (us[t] if t < N else np.zeros(nu))

            # Task terms: exact residual Jacobians in raw-x (FD through
            # mj_forward), Gauss-Newton Hessians (see module docstring).
            if self.w_com > 0:
                tt = min(t, len(self.com_ref_full) - 1)
                r = self.com(x) - self.com_ref_full[tt]
                J = self._fd_grad_raw(self.com, x)
                lx[t] += self.w_com * J.T @ r
                lxx[t] += self.w_com * J.T @ J
            if self.w_com_vel > 0 and t < N:
                tt = min(t, len(self.com_vel_ref_full) - 1)

                def com_vel(xx):
                    _, jac = self.com_and_jac(xx)
                    return jac @ xx[self.nq :]

                r = com_vel(x) - self.com_vel_ref_full[tt]
                J = self._fd_grad_raw(com_vel, x)
                lx[t] += self.w_com_vel * J.T @ r
                lxx[t] += self.w_com_vel * J.T @ J
            if self.w_ee > 0:
                for k in range(2):
                    if self.is_stance(k, t):
                        continue  # swing-only (ilqr.cpp:703)
                    tt = min(t, len(self.ee_pos_ref_full) - 1)
                    r = self.ee_pos_and_jac(x, k)[0] - self.ee_pos_ref_full[tt][k]
                    J = self._fd_grad_raw(lambda xx: self.ee_pos_and_jac(xx, k)[0], x)
                    lx[t] += self.w_ee * J.T @ r
                    lxx[t] += self.w_ee * J.T @ J
            if self.w_ee_vel > 0:
                for k in range(2):
                    if not self.is_stance(k, t):
                        continue  # stance-only (ilqr.cpp:729)

                    def ee_vel(xx, kk=k):
                        _, jp = self.ee_pos_and_jac(xx, kk)
                        return jp @ xx[self.nq :]

                    r = ee_vel(x)  # target zero velocity
                    J = self._fd_grad_raw(ee_vel, x)
                    lx[t] += self.w_ee_vel * J.T @ r
                    lxx[t] += self.w_ee_vel * J.T @ J
            if self.w_upright > 0:
                r = self._upright_res(x)
                J = self._fd_grad_raw(self._upright_res, x)
                lx[t] += self.w_upright * J.T @ r
                lxx[t] += self.w_upright * J.T @ J
            if self.w_balance > 0:
                r = self._balance_res(x, t)
                if r is not None:
                    J = self._fd_grad_raw(
                        lambda xx: self._balance_res(xx, t), x, eps=1e-5
                    )
                    lx[t] += self.w_balance * J.T @ r
                    lxx[t] += self.w_balance * J.T @ J

            # Constraint derivatives (robot_utils.cpp:682-778)
            gx, gu, hxx, huu = self._constraint_derivs(x, u)
            lx[t] += gx
            lxx[t] += hxx
            if t < N:
                lu[t] += gu
                luu[t] += huu
        return lx, lu, lxx, luu

    def _constraint_derivs(self, x, u):
        gx = np.zeros(self.nx)
        gu = np.zeros(self.nu)
        hxx = np.zeros((self.nx, self.nx))
        huu = np.zeros((self.nu, self.nu))
        cr = self.m.actuator_ctrlrange
        for i in range(self.nu):
            margin = 0.1 * (cr[i, 1] - cr[i, 0])
            lo, hi = cr[i, 0] + margin, cr[i, 1] - margin
            if u[i] > hi:
                gu[i] += 2 * self.w_torque * (u[i] - hi)
                huu[i, i] += 2 * self.w_torque
            if u[i] < lo:
                gu[i] += -2 * self.w_torque * (lo - u[i])
                huu[i, i] += 2 * self.w_torque
        for j in range(1, self.m.njnt):
            qi = self.m.jnt_qposadr[j]
            lo, hi = self.m.jnt_range[j]
            if np.isfinite(lo) and np.isfinite(hi) and lo < hi:
                margin = 0.1 * (hi - lo)
                los, his = lo + margin, hi - margin
                if x[qi] > his:
                    gx[qi] += 2 * self.w_joint * (x[qi] - his)
                    hxx[qi, qi] += 2 * self.w_joint
                if x[qi] < los:
                    gx[qi] += -2 * self.w_joint * (los - x[qi])
                    hxx[qi, qi] += 2 * self.w_joint
        return gx, gu, hxx, huu

    # --- backward pass (ilqr.cpp:250-309) -----------------------------------
    def backward(self, A, B, lx, lu, lxx, luu, reg):
        N = self.N
        K = np.zeros((N, self.nu, self.nx))
        kff = np.zeros((N, self.nu))
        Vx, Vxx = lx[N], lxx[N]
        for t in range(N - 1, -1, -1):
            Qx = lx[t] + A[t].T @ Vx
            Qu = lu[t] + B[t].T @ Vx
            Qxx = lxx[t] + A[t].T @ Vxx @ A[t]
            Quu = luu[t] + B[t].T @ Vxx @ B[t] + reg * np.eye(self.nu)
            Qxu = A[t].T @ Vxx @ B[t]
            try:
                np.linalg.cholesky(Quu)
            except np.linalg.LinAlgError:
                Quu = Quu + 1e-4 * np.eye(self.nu)
            K[t] = -np.linalg.solve(Quu, Qxu.T)
            kff[t] = -np.linalg.solve(Quu, Qu)
            Vx = Qx + K[t].T @ Quu @ kff[t] + K[t].T @ Qu + Qxu @ kff[t]
            Vxx = Qxx + K[t].T @ Quu @ K[t] + K[t].T @ Qxu.T + Qxu @ K[t]
            Vxx = 0.5 * (Vxx + Vxx.T)
        return K, kff

    # --- solve (ilqr.cpp:521-660) --------------------------------------------
    def solve(self, x0, t0=0, max_iterations=10, tol=1e-4, verbose=False):
        N = self.N
        T = len(self.x_ref_full)
        idx = np.minimum(t0 + np.arange(N + 1), T - 1)
        x_ref = self.x_ref_full[idx]
        u_ref = self.u_ref_full[idx[:N]]

        # Cold start: gravity comp + rollout (ilqr.cpp:92-115)
        u_grav = self.gravity_comp(x0)
        us = np.tile(u_grav, (N, 1))
        xs = np.zeros((N + 1, self.nx))
        xs[0] = x0
        for t in range(N):
            xs[t + 1] = self.rollout_one_step(xs[t], us[t])

        reg = 1e-6
        cost = self.total_cost(xs, us, x_ref, u_ref)
        cost0 = cost
        if verbose:
            print(f"initial cost: {cost:.4f}")
        for it in range(max_iterations):
            prev_cost = cost
            xs[0] = x0
            for t in range(N):  # forwardRolloutNominal
                xs[t + 1] = self.rollout_one_step(xs[t], us[t])
            A = np.zeros((N, self.nx, self.nx))
            B = np.zeros((N, self.nx, self.nu))
            for t in range(N):
                A[t], B[t] = self.linearize_fd(xs[t], us[t])
            lx, lu, lxx, luu = self.quadraticize(xs, us, x_ref, u_ref)

            def line_search(reg_):
                K, kff = self.backward(A, B, lx, lu, lxx, luu, reg_)
                baseline = self.total_cost(xs, us, x_ref, u_ref)
                for alpha in ALPHAS:
                    xn = np.zeros_like(xs)
                    un = np.zeros_like(us)
                    xn[0] = x0
                    for t in range(N):
                        un[t] = us[t] + alpha * kff[t] + K[t] @ (xn[t] - xs[t])
                        xn[t + 1] = self.rollout_one_step(xn[t], un[t])
                    c = self.total_cost(xn, un, x_ref, u_ref)
                    if c < baseline - 1e-6:
                        return True, xn, un, c, alpha
                return False, xs, us, baseline, None

            ok, xs2, us2, new_cost, alpha = line_search(reg)
            if not ok:
                reg = min(reg * 10.0, 1e-3)
                ok, xs2, us2, new_cost, alpha = line_search(reg)
                if not ok:
                    if it > 1:
                        break
                    continue
            xs, us, cost = xs2, us2, new_cost
            reg = max(reg / 2.0, 1e-6)
            if verbose:
                print(f"iter {it}: cost {cost:.4f} (alpha={alpha})")
            if abs(cost - prev_cost) < tol:
                break
            if cost > 1e6:
                break
        return xs, us, cost, cost0


def stock_oracle(**kw):
    """Oracle configured exactly like the reference's stock config.yaml."""
    import yaml

    with open(os.path.join(ROOT, "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    w = dict(cfg["mpc"]["cost_weights"])
    c = dict(cfg["mpc"]["constraints"])
    return Oracle(weights=w, constraints=c, **kw)


if __name__ == "__main__":
    o = stock_oracle()
    x0 = o.standing_state()
    xs, us, cost, cost0 = o.solve(x0, verbose=True)
    total, terms = o.total_cost(
        xs, us,
        o.x_ref_full[np.minimum(np.arange(o.N + 1), len(o.x_ref_full) - 1)],
        o.u_ref_full[np.minimum(np.arange(o.N), len(o.u_ref_full) - 1)],
        breakdown=True,
    )
    print(f"\nstep-0 solved cost: {cost:.4f}  (reference README: 16.27)")
    print("term breakdown:", {k: round(v, 4) for k, v in terms.items()})
