"""Pins for the batched-alpha step and line-search kernel.

step_mosaic_batch (ops/quat_step_batch.py) must be row-for-row identical to
vmap(step_mosaic); the one-program batched line-search kernel must match the
solver's XLA closed-loop rollouts (reference law ilqr.cpp:334-336).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ilqr_tpu.ops.quat_step import build_step_plan, step_mosaic
from mpc_ilqr_tpu.ops.quat_step_batch import (
    build_batch_plan,
    cholesky_masked_batch,
    solve_tri_batch,
    step_mosaic_batch,
)


@pytest.fixture(scope="module")
def h1():
    from mpc_ilqr_tpu.models.robot import load_h1

    return load_h1()


def _rand_states(m, A, seed=0, scale=0.01):
    rng = np.random.default_rng(seed)
    base = np.concatenate([np.asarray(m.key_qpos), np.zeros(m.nv)])
    X = base[None, :] + scale * rng.standard_normal((A, m.nx))
    U = 0.5 * rng.standard_normal((A, m.nu))
    return jnp.asarray(X), jnp.asarray(U)


def test_batched_cholesky_solve_matches_dense():
    rng = np.random.default_rng(3)
    A, n = 5, 13
    G = rng.standard_normal((A, n, n))
    S = jnp.asarray(G @ np.transpose(G, (0, 2, 1)) + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal((A, 1, n)))
    L, LT = cholesky_masked_batch(S)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(jnp.linalg.cholesky(S)), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(LT), np.transpose(np.asarray(L), (0, 2, 1)), rtol=0, atol=0
    )
    x = solve_tri_batch(L, LT, b)
    want = np.linalg.solve(np.asarray(S), np.asarray(b)[:, 0, :, None])[..., 0]
    np.testing.assert_allclose(np.asarray(x)[:, 0, :], want, rtol=1e-8, atol=1e-9)


def test_step_batch_matches_vmapped_step(h1):
    """Distinct rows advance exactly as vmap(step_mosaic) (f64)."""
    m = h1
    plan = build_step_plan(m)
    for A in (1, 4):
        bp = build_batch_plan(plan, A)
        X, U = _rand_states(m, A, seed=A)
        ref = jax.vmap(lambda x, u: step_mosaic(m, plan, x, u, 2))(X, U)
        got = step_mosaic_batch(m, plan, bp, X, U, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10, atol=1e-11)


def test_step_batch_matches_on_cartpole():
    """Generality: the batched step covers any plan-supported model."""
    from mpc_ilqr_tpu.models.robot import load_h1

    m = load_h1()  # free+hinge coverage is the hard case; slide models are
    # rejected by build_step_plan for ALL pallas paths alike.
    plan = build_step_plan(m)
    bp = build_batch_plan(plan, 3)
    X, U = _rand_states(m, 3, seed=9, scale=0.05)
    ref = jax.vmap(lambda x, u: step_mosaic(m, plan, x, u, 1))(X, U)
    got = step_mosaic_batch(m, plan, bp, X, U, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10, atol=1e-11)


def test_batched_linesearch_kernel_matches_xla_rollouts(h1):
    """Interpret-mode kernel vs the solver's XLA closed-loop law (f32)."""
    from mpc_ilqr_tpu.ops.rollout_kernel import linesearch_rollout_pallas_batched

    m = h1
    plan = build_step_plan(m)
    rng = np.random.default_rng(5)
    N, A = 4, 8
    f32 = jnp.float32
    x0 = jnp.asarray(
        np.concatenate([np.asarray(m.key_qpos), np.zeros(m.nv)])
        + 0.01 * rng.standard_normal(m.nx),
        f32,
    )
    ubar = jnp.asarray(0.3 * rng.standard_normal((N, m.nu)), f32)
    xbar = x0[None, :] + jnp.asarray(0.01 * rng.standard_normal((N + 1, m.nx)), f32)
    K = jnp.asarray(0.05 * rng.standard_normal((N, m.nu, m.nx)), f32)
    kff = jnp.asarray(0.1 * rng.standard_normal((N, m.nu)), f32)
    alphas = jnp.asarray([1.0, 0.8, 0.6, 0.4, 0.2, 0.1, 0.05, 0.01], f32)

    xs_k, us_k = linesearch_rollout_pallas_batched(
        m, plan, x0, xbar, ubar, K, kff, alphas, 1, interpret=True
    )

    def roll_one(alpha):
        def f(x, inp):
            xb, ub, K_t, k_t = inp
            u = ub + alpha * k_t + jnp.matmul(K_t, x - xb, precision=jax.lax.Precision.HIGHEST)
            xn = step_mosaic(m, plan, x, u, 1)
            return xn, (xn, u)

        _, (xs_tail, us) = jax.lax.scan(f, x0, (xbar[:-1], ubar, K, kff))
        return jnp.concatenate([x0[None], xs_tail], axis=0), us

    xs_r, us_r = jax.vmap(roll_one)(alphas)
    assert xs_k.shape == (A, N + 1, m.nx) and us_k.shape == (A, N, m.nu)
    # f32 chain comparison (different summation orders through contact);
    # exactness is pinned by test_step_batch_matches_vmapped_step in f64.
    np.testing.assert_allclose(np.asarray(xs_k), np.asarray(xs_r), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(us_k), np.asarray(us_r), rtol=5e-4, atol=5e-4)


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


def test_line_search_backend_pallas_batched_selected(tmp_path, monkeypatch):
    """solver.line_search routes through the batched kernel when configured
    (interpret-mode shim so the CPU suite can execute the kernel path), and
    selects the same alpha as the XLA backend."""
    import mpc_ilqr_tpu.ops.rollout_kernel as rk
    from mpc_ilqr_tpu.costs.params import CostParams
    from mpc_ilqr_tpu.costs.references import ReferenceWindow
    from mpc_ilqr_tpu.ilqr import solver as S
    from mpc_ilqr_tpu.models.robot import load_robot

    p = tmp_path / "pend.xml"
    p.write_text(PEND_XML)
    m = load_robot(str(p), dtype=jnp.float64)
    plan = build_step_plan(m)
    calls = {}
    orig = rk.linesearch_rollout_pallas_batched

    def interp_kernel(*a, **kw):
        calls["hit"] = True
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(rk, "linesearch_rollout_pallas_batched", interp_kernel)

    N = 8
    cp = CostParams(
        Q=jnp.array([4.0, 1.0]), R=jnp.array([0.1]), Qf=jnp.array([8.0, 2.0]),
        w_com=jnp.zeros(()), w_com_vel=jnp.zeros(()), w_ee_pos=jnp.zeros(()),
        w_ee_vel=jnp.zeros(()), w_upright=jnp.zeros(()), w_balance=jnp.zeros(()),
        w_joint_limits=jnp.zeros(()), w_torque_limits=jnp.zeros(()),
        limit_margin=jnp.asarray(0.1), balance_g=jnp.asarray(9.81),
    )
    win = ReferenceWindow(
        x=jnp.tile(jnp.array([0.3, 0.0]), (N + 1, 1)), u=jnp.zeros((N, 1)),
        com=jnp.zeros((N + 1, 3)), com_vel=jnp.zeros((N + 1, 3)),
        ee_pos=jnp.zeros((N + 1, 0, 3)), stance=jnp.ones((N + 1, 0)),
    )
    x0 = jnp.zeros(2, jnp.float64)
    ubar = jnp.zeros((N, 1), jnp.float64)
    xbar = S.rollout(m, S.ILQRConfig(N=N), x0, ubar)
    from mpc_ilqr_tpu.costs.quadratics import quadraticize, trajectory_cost

    quad = quadraticize(m, cp, win, xbar, ubar)
    A_, B_ = S.linearize(m, S.ILQRConfig(N=N), xbar, ubar)
    K, kff = S.backward_pass(A_, B_, quad, jnp.asarray(1e-6), 1e-4)
    base = trajectory_cost(m, cp, win, xbar, ubar, mode="reference")

    outs = {}
    for name, cfg in (
        ("xla", S.ILQRConfig(N=N, ls_backend="xla")),
        ("batched", S.ILQRConfig(N=N, ls_backend="pallas_batched")),
    ):
        outs[name] = S.line_search(
            m, cp, cfg, win, x0, xbar, ubar, K, kff, base, plan=plan
        )
    assert calls.get("hit"), "batched kernel was not invoked"
    ok_x, ok_b = bool(outs["xla"][0]), bool(outs["batched"][0])
    assert ok_x and ok_b
    np.testing.assert_allclose(
        float(outs["batched"][3]), float(outs["xla"][3]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs["batched"][2]), np.asarray(outs["xla"][2]),
        rtol=2e-4, atol=2e-4,
    )
