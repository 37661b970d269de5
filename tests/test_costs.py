"""Cost-library correctness: AD quadratics vs finite differences (the
reference's own FD recipe, robot_utils.cpp:120-160, is the oracle pattern),
hand-computed term values, gating semantics, Q/R/Qf construction parity."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ilqr_tpu.costs import terms
from mpc_ilqr_tpu.costs.params import build_cost_params
from mpc_ilqr_tpu.costs.quadratics import quadraticize
from mpc_ilqr_tpu.costs.references import ReferenceWindow
from mpc_ilqr_tpu.io.config import load_config
from mpc_ilqr_tpu.models.robot import load_h1, standing_state

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def setup():
    app = load_config(os.path.join(ROOT, "config.yaml"))
    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02, dtype=jnp.float64)
    cp = build_cost_params(model, app.mpc.cost_weights, app.mpc.constraints, dtype=jnp.float64)
    return model, cp, app


def test_qrqf_construction(setup):
    """Q/R/Qf diagonals must reproduce Config::buildCostMatrices
    (config.cpp:66-122) element by element."""
    model, cp, app = setup
    w = app.mpc.cost_weights
    nq = model.nq
    Q = np.asarray(cp.Q)
    assert Q[0] == w["Q_position_x"] and Q[1] == w["Q_position_y"] and Q[2] == w["Q_position_z"]
    assert Q[3] == w["Q_quat_w"]
    assert list(Q[4:7]) == w["Q_quat_xyz"]
    assert np.all(Q[7:nq] == w["Q_joint_pos"])
    assert Q[nq] == w["Q_vel_x"] and Q[nq + 2] == w["Q_vel_z"]
    assert np.all(Q[nq + 3 : nq + 6] == w["Q_ang_vel"])
    assert np.all(Q[nq + 6 :] == w["Q_joint_vel"])
    assert np.all(np.asarray(cp.R) == w["R_control"])
    Qf = np.asarray(cp.Qf)
    assert Qf[0] == Q[0] * w["Qf_multiplier"] * w["Qf_position_x"]
    assert Qf[2] == Q[2] * w["Qf_multiplier"] * w["Qf_position_z"]
    assert Qf[nq + 2] == Q[nq + 2] * w["Qf_multiplier"] * w["Qf_vel_z"]
    assert Qf[7] == Q[7] * w["Qf_multiplier"]  # plain multiplier elsewhere


def test_upright_cost_zero_when_upright(setup):
    model, cp, _ = setup
    x = standing_state(model)
    assert float(terms.upright_cost(cp, x)) == 0.0
    # Tilt 0.2 rad about x: cost = 0.5*w*|z_axis - e_z|^2 with |.|^2 = 2(1-cosθ)... compute
    th = 0.2
    x2 = x.at[3].set(np.cos(th / 2)).at[4].set(np.sin(th / 2))
    z = np.array([0.0, -np.sin(th), np.cos(th)])
    expect = 0.5 * float(cp.w_upright) * np.sum((z - [0, 0, 1.0]) ** 2)
    np.testing.assert_allclose(float(terms.upright_cost(cp, x2)), expect, rtol=1e-10)


def test_support_center_cases(setup):
    ee = jnp.asarray([[0.0, 0.1, 0.0], [0.2, -0.1, 0.0]])
    c, a = terms.support_center(ee, jnp.asarray([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(c), [0.1, 0.0])
    assert float(a) == 1.0
    c, a = terms.support_center(ee, jnp.asarray([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(c), [0.0, 0.1])
    c, a = terms.support_center(ee, jnp.asarray([0.0, 0.0]))
    assert float(a) == 0.0  # flight: balance term gated off


def test_limit_costs_margins(setup):
    """10% margin semantics (robot_utils.cpp:627-641): inside the safe band
    the penalty and its derivatives vanish; outside it is w*violation^2."""
    model, cp, _ = setup
    x = standing_state(model)
    assert float(terms.joint_limit_cost(model, cp, x)) >= 0.0
    u = jnp.zeros(model.nu, jnp.float64)
    assert float(terms.torque_limit_cost(model, cp, u)) == 0.0
    # Push one actuator past its safe bound: ctrlrange ±200, margin 40 -> safe 160
    u2 = u.at[0].set(170.0)
    expect = float(cp.w_torque_limits) * (170.0 - 160.0) ** 2
    np.testing.assert_allclose(float(terms.torque_limit_cost(model, cp, u2)), expect, rtol=1e-9)


def test_quadratics_match_finite_differences(setup):
    """lx/lxx/lu/luu from AD must match central finite differences of the
    stage cost — the FD linearization the reference trusts is our oracle."""
    model, cp, _ = setup
    N = 2
    x0 = standing_state(model)
    xs = jnp.stack([x0, x0 + 0.01, x0 - 0.005])
    us = jnp.asarray(RNG.normal(0, 1.0, (N, model.nu)))
    win = ReferenceWindow(
        x=jnp.stack([x0, x0, x0]),
        u=jnp.zeros((N, model.nu), jnp.float64),
        com=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N + 1, 1)),
        com_vel=jnp.zeros((N + 1, 3), jnp.float64),
        ee_pos=jnp.zeros((N + 1, 2, 3), jnp.float64),
        stance=jnp.ones((N + 1, 2), jnp.float64),
    )
    quad = quadraticize(model, cp, win, xs, us)

    t = 0
    f_x = lambda x: float(
        terms.stage_cost_full(
            model, cp, x, us[t], win.x[t], win.u[t], win.com[t], win.com_vel[t],
            win.ee_pos[t], win.stance[t],
        )
    )
    eps = 1e-6
    xnp = np.asarray(xs[t])
    for i in RNG.choice(model.nx, 8, replace=False):
        e = np.zeros(model.nx)
        e[i] = eps
        fd = (f_x(jnp.asarray(xnp + e)) - f_x(jnp.asarray(xnp - e))) / (2 * eps)
        np.testing.assert_allclose(float(quad.lx[t, i]), fd, rtol=1e-4, atol=1e-6)

    # Hessian row check via FD of the AD gradient
    g_x = jax.grad(
        lambda x: terms.stage_cost_full(
            model, cp, x, us[t], win.x[t], win.u[t], win.com[t], win.com_vel[t],
            win.ee_pos[t], win.stance[t],
        )
    )
    i = 4  # a quaternion component: exercises FK curvature
    e = np.zeros(model.nx)
    e[i] = eps
    fd_row = (np.asarray(g_x(jnp.asarray(xnp + e))) - np.asarray(g_x(jnp.asarray(xnp - e)))) / (
        2 * eps
    )
    np.testing.assert_allclose(np.asarray(quad.lxx[t, i]), fd_row, rtol=1e-3, atol=1e-5)


def test_swing_stance_gating(setup):
    """EE position cost only in swing, EE velocity cost only in stance
    (ilqr.cpp:703, 729)."""
    model, cp, _ = setup
    x = standing_state(model)
    ee_ref = jnp.asarray(RNG.normal(0, 0.3, (2, 3)))
    both_stance = jnp.asarray([1.0, 1.0])
    both_swing = jnp.asarray([0.0, 0.0])
    assert float(terms.ee_pos_cost(model, cp, x, ee_ref, both_stance)) == 0.0
    assert float(terms.ee_pos_cost(model, cp, x, ee_ref, both_swing)) > 0.0
    xm = x.at[model.nq + 0].set(0.5)  # give the feet some velocity
    assert float(terms.ee_vel_cost(model, cp, xm, both_swing)) == 0.0
    assert float(terms.ee_vel_cost(model, cp, xm, both_stance)) > 0.0


def test_tangent_quat_mode(setup):
    """Opt-in tangent-space orientation error: double-cover safe (q and -q
    are the same rotation), reduces to ~theta^2 for small tilts; the raw
    reference mode is sign-sensitive (ilqr.cpp:141 parity)."""
    import dataclasses

    from mpc_ilqr_tpu.models.robot import standing_state

    model, cp_raw, app = setup
    cp_tan = cp_raw.replace(quat_tangent=True)
    x = standing_state(model)
    x_neg = x.at[3:7].multiply(-1.0)
    assert float(terms.tracking_cost(cp_raw, x_neg, x, model=model)) > 1.0
    assert abs(float(terms.tracking_cost(cp_tan, x_neg, x, model=model))) < 1e-9
    # small tilt about x: tangent cost ≈ 0.5 * w_qx * theta^2
    th = 0.01
    x_t = x.at[3].set(np.cos(th / 2)).at[4].set(np.sin(th / 2))
    c = float(terms.tracking_cost(cp_tan, x_t, x, model=model))
    np.testing.assert_allclose(c, 0.5 * 50.0 * th**2, rtol=1e-4)


def test_hess_chunk_matches_full_width(setup):
    """quadraticize(hess_chunk=k) (direction-chunked x-Hessian — the knob
    that removes the residual fleet-scale HBM peak) must equal the plain
    jax.hessian path; only the vmap/lax.map structure differs. Includes a
    non-dividing chunk (padding)."""
    model, cp, _ = setup
    N = 2
    x0 = standing_state(model)
    xs = jnp.stack([x0, x0 + 0.01, x0 - 0.005])
    us = jnp.asarray(RNG.normal(0, 1.0, (N, model.nu)))
    win = ReferenceWindow(
        x=jnp.stack([x0, x0, x0]),
        u=jnp.zeros((N, model.nu), jnp.float64),
        com=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N + 1, 1)),
        com_vel=jnp.zeros((N + 1, 3), jnp.float64),
        ee_pos=jnp.zeros((N + 1, 2, 3), jnp.float64),
        stance=jnp.ones((N + 1, 2), jnp.float64),
    )
    q0 = quadraticize(model, cp, win, xs, us)
    for chunk in (10, 16):  # 16 does not divide nx=51 -> padded
        q = quadraticize(model, cp, win, xs, us, hess_chunk=chunk)
        np.testing.assert_allclose(np.asarray(q.lxx), np.asarray(q0.lxx),
                                   atol=1e-9, err_msg=f"chunk={chunk}")
        np.testing.assert_allclose(np.asarray(q.lx), np.asarray(q0.lx), atol=0)
        np.testing.assert_allclose(np.asarray(q.luu), np.asarray(q0.luu), atol=0)


def _random_window(model, N, seed=11):
    rng = np.random.default_rng(seed)
    x0 = standing_state(model)
    xs = x0[None] + jnp.asarray(0.02 * rng.standard_normal((N + 1, model.nx)))
    us = jnp.asarray(2.0 * rng.standard_normal((N, model.nu)))
    stance = jnp.asarray(rng.integers(0, 2, (N + 1, 2)), jnp.float64)
    win = ReferenceWindow(
        x=x0[None] + jnp.asarray(0.01 * rng.standard_normal((N + 1, model.nx))),
        u=jnp.asarray(0.5 * rng.standard_normal((N, model.nu))),
        com=jnp.asarray([0.0, 0.0, 1.0]) + jnp.asarray(0.01 * rng.standard_normal((N + 1, 3))),
        com_vel=jnp.asarray(0.05 * rng.standard_normal((N + 1, 3))),
        ee_pos=jnp.asarray(0.2 * rng.standard_normal((N + 1, 2, 3))),
        stance=stance,
    )
    return xs, us, win


def test_task_residual_stack_matches_terms(setup):
    """0.5·||task_residuals||² must equal the summed task terms EXACTLY
    (weights/gates/0.5-conventions folded via square roots) — at random
    states, mixed stance gates, stage and terminal variants."""
    model, cp, _ = setup
    N = 4
    xs, us, win = _random_window(model, N)
    for t in range(N):
        r = terms.task_residuals(model, cp, xs[t], win.com[t], win.com_vel[t],
                                 win.ee_pos[t], win.stance[t])
        full = terms.stage_cost_full(model, cp, xs[t], us[t], win.x[t], win.u[t],
                                     win.com[t], win.com_vel[t], win.ee_pos[t], win.stance[t])
        light = (terms.tracking_cost(cp, xs[t], win.x[t], us[t], win.u[t], model=model)
                 + terms.joint_limit_cost(model, cp, xs[t])
                 + terms.torque_limit_cost(model, cp, us[t]))
        np.testing.assert_allclose(0.5 * float(jnp.sum(r * r)),
                                   float(full) - float(light), rtol=1e-10)
    rT = terms.task_residuals(model, cp, xs[N], win.com[N], win.com_vel[N],
                              win.ee_pos[N], win.stance[N], terminal=True)
    fullT = terms.terminal_cost_full(model, cp, xs[N], win.x[N], win.com[N],
                                     win.com_vel[N], win.ee_pos[N], win.stance[N])
    lightT = (terms.tracking_cost(cp, xs[N], win.x[N], terminal=True, model=model)
              + terms.joint_limit_cost(model, cp, xs[N]))
    np.testing.assert_allclose(0.5 * float(jnp.sum(rT * rT)),
                               float(fullT) - float(lightT), rtol=1e-10)


def test_gn_quadraticization(setup):
    """hess_mode="gn": lx/lu/luu EXACT vs jax.hessian (the gradient of a
    sum of squares is Jᵀr — no approximation), lxx = light-exact + JᵀJ with
    the task block PSD; only the ∑ rᵢ∇²rᵢ curvature may differ."""
    model, cp, _ = setup
    N = 3
    xs, us, win = _random_window(model, N, seed=13)
    qe = quadraticize(model, cp, win, xs, us)
    qg = quadraticize(model, cp, win, xs, us, hess_mode="gn")
    np.testing.assert_allclose(np.asarray(qg.lx), np.asarray(qe.lx), atol=1e-9)
    np.testing.assert_allclose(np.asarray(qg.lu), np.asarray(qe.lu), atol=0)
    np.testing.assert_allclose(np.asarray(qg.luu), np.asarray(qe.luu), atol=0)
    # The GN lxx stays symmetric and its task part PSD: eigenvalues of the
    # full lxx bounded below by the light part's (diag Q / limit) minimum.
    for t in range(N + 1):
        H = np.asarray(qg.lxx[t])
        np.testing.assert_allclose(H, H.T, atol=1e-10)
        assert np.linalg.eigvalsh(H).min() > -1e-9
    # Curvature gap is real but bounded (sanity: same order as exact lxx).
    gap = float(jnp.abs(qg.lxx - qe.lxx).max())
    assert gap < 0.5 * float(jnp.abs(qe.lxx).max()) + 1e-9


def test_gn_hess_chunk_matches_full_width(setup):
    """hess_mode="gn" must honor hess_chunk: the unchunked jacfwd(R_stage)
    pushes all nx tangents through FK at once — at fleet=1024 that temp
    ([1024,25,51,20,25,3] = 9.7 GB) OOM'd the one-graph fleet solve on
    hardware (round 4) even though --fleet-hesschunk was set. The chunked
    residual Jacobian must be bit-identical in math (same jvps, grouped)."""
    model, cp, _ = setup
    N = 2
    xs, us, win = _random_window(model, N, seed=21)
    q0 = quadraticize(model, cp, win, xs, us, hess_mode="gn")
    for chunk in (10, 16):  # 16 does not divide nx=51 -> padded
        q = quadraticize(model, cp, win, xs, us, hess_mode="gn",
                         hess_chunk=chunk)
        np.testing.assert_allclose(np.asarray(q.lxx), np.asarray(q0.lxx),
                                   atol=1e-9, err_msg=f"chunk={chunk}")
        np.testing.assert_allclose(np.asarray(q.lx), np.asarray(q0.lx),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(q.luu), np.asarray(q0.luu),
                                   atol=0)
