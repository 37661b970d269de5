"""iLQR solver correctness: LQR recovery, convergence, line-search policy.

The reference has no tests; SURVEY §4 defines the strategy these implement —
iLQR on a linear-quadratic problem must recover the finite-horizon Riccati
solution in one iteration (alpha=1 accepted immediately).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ilqr_tpu.costs.params import CostParams
from mpc_ilqr_tpu.costs.references import ReferenceWindow
from mpc_ilqr_tpu.ilqr import solver as ilqr
from mpc_ilqr_tpu.models.robot import load_robot

PEND_XML = """
<mujoco model="pend"><option timestep="0.05" gravity="0 0 0"/>
<worldbody><body name="arm" pos="0 0 1">
  <inertial pos="0 0 -0.5" mass="1" diaginertia="0.01 0.01 0.01"/>
  <joint name="hinge" axis="0 1 0" damping="0.1" armature="0.05"/>
  <geom type="capsule" size="0.05 0.5" pos="0 0 -0.5" contype="0" conaffinity="0"/>
</body></worldbody>
<actuator><motor name="m" joint="hinge" ctrlrange="-100 100"/></actuator>
</mujoco>
"""


@pytest.fixture(scope="module")
def pend(tmp_path_factory):
    p = tmp_path_factory.mktemp("m") / "pend.xml"
    p.write_text(PEND_XML)
    return load_robot(str(p), dtype=jnp.float64)


def make_lq_problem(model, N=15):
    dt = jnp.float64
    cp = CostParams(
        Q=jnp.array([4.0, 1.0]),
        R=jnp.array([0.1]),
        Qf=jnp.array([8.0, 2.0]),
        w_com=jnp.zeros(()), w_com_vel=jnp.zeros(()), w_ee_pos=jnp.zeros(()),
        w_ee_vel=jnp.zeros(()), w_upright=jnp.zeros(()), w_balance=jnp.zeros(()),
        w_joint_limits=jnp.zeros(()), w_torque_limits=jnp.zeros(()),
        limit_margin=jnp.asarray(0.1), balance_g=jnp.asarray(9.81),
    )
    x_tgt = jnp.array([0.3, 0.0])
    win = ReferenceWindow(
        x=jnp.tile(x_tgt, (N + 1, 1)),
        u=jnp.zeros((N, 1)),
        com=jnp.zeros((N + 1, 3)),
        com_vel=jnp.zeros((N + 1, 3)),
        ee_pos=jnp.zeros((N + 1, 0, 3)),
        stance=jnp.ones((N + 1, 0)),
    )
    cfg = ilqr.ILQRConfig(N=N)
    return cp, win, cfg


def dlqr_gains(A, B, Q, R, Qf, N):
    """Finite-horizon discrete Riccati recursion (numpy oracle)."""
    V = Qf.copy()
    Ks = []
    for _ in range(N):
        Quu = R + B.T @ V @ B
        Qux = B.T @ V @ A
        K = -np.linalg.solve(Quu, Qux)
        V = Q + A.T @ V @ A + A.T @ V @ B @ K
        V = 0.5 * (V + V.T)
        Ks.append(K)
    return Ks[::-1]


def test_lqr_recovery(pend):
    """On a linear system one iLQR iteration IS finite-horizon LQR: the
    first-iteration gains match the Riccati recursion and alpha=1 is taken.

    (After convergence the reference keeps bumping lambda on failed line
    searches and retains the last backward pass's gains — replicated here —
    so only the single-iteration gains are Riccati-exact.)
    """
    cp, win, cfg = make_lq_problem(pend)
    x0 = jnp.zeros(2, dtype=jnp.float64)

    # Linearization is exact for this system.
    A, B = ilqr.linearize(pend, cfg, jnp.tile(x0, (cfg.N + 1, 1)), jnp.zeros((cfg.N, 1)))
    A0, B0 = np.asarray(A[0]), np.asarray(B[0])
    np.testing.assert_allclose(np.asarray(A), np.tile(A0, (cfg.N, 1, 1)), atol=1e-9)

    import dataclasses

    cfg1 = dataclasses.replace(cfg, max_iterations=1)
    sol1 = ilqr.solve(pend, cp, cfg1, x0, win, jnp.zeros((cfg.N, 1), jnp.float64))
    Ks = dlqr_gains(A0, B0, np.diag([4.0, 1.0]), np.array([[0.1]]), np.diag([8.0, 2.0]), cfg.N)
    np.testing.assert_allclose(np.asarray(sol1.K[0]), Ks[0], atol=1e-4)  # reg=1e-6 offset
    np.testing.assert_allclose(np.asarray(sol1.K[-1]), Ks[-1], atol=1e-4)

    # Full solve converges and tracks the target.
    sol = ilqr.solve(pend, cp, cfg, x0, win, jnp.zeros((cfg.N, 1), jnp.float64))
    assert int(sol.iterations) <= cfg.max_iterations
    # Moves decisively toward the target (R=0.1 keeps it from pinning 0.3
    # exactly within the short horizon — that IS the LQR optimum).
    assert float(sol.xbar[-1, 0]) > 0.15
    assert float(sol.cost) < 2.5  # below the do-nothing cost of ~3.06
    # Cost did not regress vs the single-iteration solve.
    assert float(sol.cost) <= float(sol1.cost) + 1e-9


def test_cost_decreases_monotonically(pend):
    cp, win, cfg = make_lq_problem(pend)
    x0 = jnp.array([1.0, 0.0], dtype=jnp.float64)
    u0 = jnp.zeros((cfg.N, 1), jnp.float64)
    from mpc_ilqr_tpu.costs.quadratics import trajectory_cost

    xs0 = ilqr.rollout(pend, cfg, x0, u0)
    c0 = trajectory_cost(pend, cp, win, xs0, u0, mode="reference")
    sol = ilqr.solve(pend, cp, cfg, x0, win, u0)
    assert float(sol.cost) < float(c0)
    assert bool(sol.success)


def test_line_search_first_accept_matches_serial(pend):
    """Batched first-accept must pick the same alpha as the serial loop."""
    cp, win, cfg = make_lq_problem(pend)
    x0 = jnp.array([0.8, 0.0], dtype=jnp.float64)
    ubar = jnp.zeros((cfg.N, 1), jnp.float64)
    xbar = ilqr.rollout(pend, cfg, x0, ubar)
    from mpc_ilqr_tpu.costs.quadratics import quadraticize, trajectory_cost

    quad = quadraticize(pend, cp, win, xbar, ubar)
    A, B = ilqr.linearize(pend, cfg, xbar, ubar)
    K, kff = ilqr.backward_pass(A, B, quad, jnp.asarray(1e-6), 1e-4)
    base = trajectory_cost(pend, cp, win, xbar, ubar, mode="reference")
    ok, xs, us, cost, _ = ilqr.line_search(pend, cp, cfg, win, x0, xbar, ubar, K, kff, base)
    assert bool(ok)

    # Serial reference loop
    for alpha in cfg.alphas:
        x = x0
        us_serial = []
        xs_serial = [x]
        for t in range(cfg.N):
            u = ubar[t] + alpha * kff[t] + K[t] @ (x - xbar[t])
            from mpc_ilqr_tpu.dynamics import engine

            x = engine.step(pend, x, u)
            us_serial.append(u)
            xs_serial.append(x)
        c = trajectory_cost(
            pend, cp, win, jnp.stack(xs_serial), jnp.stack(us_serial), mode="reference"
        )
        if float(c) < float(base) - cfg.accept_threshold:
            break
    np.testing.assert_allclose(float(cost), float(c), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(us), np.stack(us_serial), atol=1e-12)


def test_reference_window_clamps():
    from mpc_ilqr_tpu.costs.references import ReferenceSet, extract_window

    T, nx = 10, 3
    refs = ReferenceSet(
        x=jnp.arange(T)[:, None] * jnp.ones((T, nx)),
        u=jnp.zeros((T, 1)),
        com=jnp.zeros((T, 3)),
        com_vel=jnp.zeros((T, 3)),
        ee_pos=jnp.zeros((T, 2, 3)),
        ee_vel=jnp.zeros((T, 2, 3)),
        stance=jnp.ones((T, 2)),
    )
    win = extract_window(refs, jnp.asarray(7), 5)
    np.testing.assert_array_equal(np.asarray(win.x[:, 0]), [7, 8, 9, 9, 9, 9])


def test_all_line_search_failures_report_failure(pend):
    """A solve where every line search fails must report success=False so the
    MPC previous-control fallback engages (the reference propagates solve
    failure, mpc.cpp:82-91). Negative-definite costs make the Riccati
    Cholesky fail -> NaN gains -> every rollout cost inf-masked; the carried
    cost stays the finite baseline, so isfinite(cost) alone would wrongly
    report success (the round-1 bug)."""
    cp, win, cfg = make_lq_problem(pend)
    cp_bad = cp.replace(Q=-cp.Q, R=-cp.R, Qf=-cp.Qf)
    x0 = jnp.array([0.8, 0.0], dtype=jnp.float64)
    ubar = jnp.zeros((cfg.N, 1), jnp.float64)
    sol = jax.jit(lambda: ilqr.solve(pend, cp_bad, cfg, x0, win, ubar))()
    assert not bool(sol.success)
    assert np.isfinite(float(sol.cost))  # finite baseline carried through


def test_stationary_warm_start_reports_success(pend):
    """Re-solving from an already-converged solution finds no improving alpha
    (all deltas < accept_threshold) — that is a *successful* stationary solve,
    not a failure."""
    cp, win, cfg = make_lq_problem(pend)
    x0 = jnp.array([0.8, 0.0], dtype=jnp.float64)
    ubar = jnp.zeros((cfg.N, 1), jnp.float64)
    sol1 = jax.jit(lambda u: ilqr.solve(pend, cp, cfg, x0, win, u))(ubar)
    assert bool(sol1.success)
    sol2 = jax.jit(lambda u: ilqr.solve(pend, cp, cfg, x0, win, u))(sol1.ubar)
    assert bool(sol2.success)


def test_failed_solve_preserves_mpc_carry(pend):
    """step_once on a failing solve must (a) fall back to the previous
    control, (b) leave prev_* and t_idx untouched (mpc.cpp:85-118) — one bad
    solve must not poison the warm-start carry (ADVICE r1)."""
    from mpc_ilqr_tpu.costs.references import ReferenceSet
    from mpc_ilqr_tpu.mpc import controller

    cp, win, cfg = make_lq_problem(pend, N=8)
    cfg = ilqr.ILQRConfig(N=8, max_iterations=3)
    T = 20
    refs = ReferenceSet(
        x=jnp.tile(jnp.array([0.3, 0.0]), (T, 1)),
        u=jnp.zeros((T, 1)),
        com=jnp.zeros((T, 3)),
        com_vel=jnp.zeros((T, 3)),
        ee_pos=jnp.zeros((T, 0, 3)),
        ee_vel=jnp.zeros((T, 0, 3)),
        stance=jnp.ones((T, 0)),
    )
    x0 = jnp.array([0.8, 0.0], dtype=jnp.float64)
    state0 = controller.init_state(pend, cfg, dtype=jnp.float64)

    # One good step to populate the carry.
    state1, u1, d1 = jax.jit(
        lambda s, x: controller.step_once(pend, cp, cfg, refs, s, x)
    )(state0, x0)
    assert bool(d1.solve_ok) and bool(state1.has_prev) and int(state1.t_idx) == 1

    # Failing solve: negative-definite costs (see test above).
    cp_bad = cp.replace(Q=-cp.Q, R=-cp.R, Qf=-cp.Qf)
    state2, u2, d2 = jax.jit(
        lambda s, x: controller.step_once(pend, cp_bad, cfg, refs, s, x)
    )(state1, x0)
    assert not bool(d2.solve_ok)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(state1.prev_ubar[0]))
    assert int(state2.t_idx) == int(state1.t_idx)
    np.testing.assert_array_equal(np.asarray(state2.prev_ubar), np.asarray(state1.prev_ubar))
    np.testing.assert_array_equal(np.asarray(state2.prev_xbar), np.asarray(state1.prev_xbar))
    np.testing.assert_array_equal(np.asarray(state2.prev_K), np.asarray(state1.prev_K))


def test_cascade_line_search_matches_first_accept(pend):
    """line_search="cascade" (alpha=1 fast path + batched fallback) must be
    solution-identical to "first_accept" — same alpha ordering, two phases."""
    import dataclasses

    cp, win, cfg = make_lq_problem(pend)
    x0 = jnp.array([0.9, -0.2], dtype=jnp.float64)
    ubar = jnp.zeros((cfg.N, 1), jnp.float64)
    sol_fa = jax.jit(lambda: ilqr.solve(pend, cp, cfg, x0, win, ubar))()
    cfg_c = dataclasses.replace(cfg, line_search="cascade")
    sol_ca = jax.jit(lambda: ilqr.solve(pend, cp, cfg_c, x0, win, ubar))()
    np.testing.assert_allclose(float(sol_ca.cost), float(sol_fa.cost), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_ca.ubar), np.asarray(sol_fa.ubar), atol=1e-12)
    assert int(sol_ca.iterations) == int(sol_fa.iterations)
    assert bool(sol_ca.success) == bool(sol_fa.success)


def test_fleet_tuned_knobs_preserve_solution_quality(pend):
    """inner_attempts=1 and linearize_every=2 (the fleet-tuned trades, see
    ILQRConfig) must still solve the LQ problem: on a problem where every
    line search accepts at alpha=1, attempts never retry and stale A/B are
    exact (linear dynamics), so all three solves are numerically identical."""
    import dataclasses

    cp, win, cfg = make_lq_problem(pend)
    x0 = jnp.array([0.7, 0.1], dtype=jnp.float64)
    ubar = jnp.zeros((cfg.N, 1), jnp.float64)

    base = dataclasses.replace(cfg, outer_loop="scan", max_iterations=3)
    sol0 = jax.jit(lambda: ilqr.solve(pend, cp, base, x0, win, ubar))()
    assert bool(sol0.success)

    c1 = dataclasses.replace(base, inner_attempts=1)
    sol1 = jax.jit(lambda: ilqr.solve(pend, cp, c1, x0, win, ubar))()
    np.testing.assert_allclose(float(sol1.cost), float(sol0.cost), rtol=1e-12)

    c2 = dataclasses.replace(base, linearize_every=2)
    sol2 = jax.jit(lambda: ilqr.solve(pend, cp, c2, x0, win, ubar))()
    np.testing.assert_allclose(float(sol2.cost), float(sol0.cost), rtol=1e-12)

    c3 = dataclasses.replace(base, inner_attempts=1, linearize_every=2)
    sol3 = jax.jit(lambda: ilqr.solve(pend, cp, c3, x0, win, ubar))()
    np.testing.assert_allclose(float(sol3.cost), float(sol0.cost), rtol=1e-12)


def test_fleet_tuned_knobs_under_vmap(pend):
    """The unrolled (linearize_every>1) scan path and single-attempt inner
    loop must vmap cleanly — the fleet shape that motivates them."""
    import dataclasses

    cp, win, cfg = make_lq_problem(pend)
    c = dataclasses.replace(
        cfg, outer_loop="scan", max_iterations=2, inner_attempts=1, linearize_every=2
    )
    x0s = jnp.stack([jnp.array([0.5, 0.0]), jnp.array([-0.4, 0.2]),
                     jnp.array([0.1, -0.3])]).astype(jnp.float64)
    ubar = jnp.zeros((cfg.N, 1), jnp.float64)
    sols = jax.jit(jax.vmap(lambda x0: ilqr.solve(pend, cp, c, x0, win, ubar)))(x0s)
    assert bool(jnp.all(sols.success))
    assert bool(jnp.all(jnp.isfinite(sols.cost)))
    # Each instance must beat its do-nothing baseline.
    from mpc_ilqr_tpu.costs.quadratics import trajectory_cost

    for i in range(3):
        xs0 = ilqr.rollout(pend, cfg, x0s[i], ubar)
        c0 = trajectory_cost(pend, cp, win, xs0, ubar, mode="reference")
        assert float(sols.cost[i]) < float(c0) + 1e-9
