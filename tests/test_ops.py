"""Pallas kernel tests (interpret mode on CPU): the one-launch Riccati
kernel must reproduce the lax.scan backward pass to f32 round-off."""
import jax
import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.costs.quadratics import CostQuadratics
from mpc_ilqr_tpu.ilqr.solver import backward_pass
from mpc_ilqr_tpu.ops.riccati import backward_pass_pallas

RNG = np.random.default_rng(42)


def random_problem(N=10, nx=51, nu=19):
    A = jnp.asarray(
        np.eye(nx) + 0.02 * RNG.normal(size=(N, nx, nx)), dtype=jnp.float32
    )
    B = jnp.asarray(0.02 * RNG.normal(size=(N, nx, nu)), dtype=jnp.float32)
    lx = jnp.asarray(RNG.normal(size=(N + 1, nx)), dtype=jnp.float32)
    lu = jnp.asarray(RNG.normal(size=(N, nu)), dtype=jnp.float32)
    Qd = RNG.uniform(1.0, 5.0, size=(N + 1, nx))
    Rd = RNG.uniform(0.1, 1.0, size=(N, nu))
    lxx = jnp.asarray(np.einsum("ti,ij->tij", Qd, np.eye(nx)), dtype=jnp.float32)
    luu = jnp.asarray(np.einsum("ti,ij->tij", Rd, np.eye(nu)), dtype=jnp.float32)
    return A, B, CostQuadratics(lx=lx, lu=lu, lxx=lxx, luu=luu)


def test_pallas_riccati_matches_scan():
    A, B, quad = random_problem()
    reg = jnp.float32(1e-6)
    K_s, k_s = backward_pass(A, B, quad, reg, 1e-4)
    K_p, k_p = backward_pass_pallas(
        A, B, quad.lx, quad.lu, quad.lxx, quad.luu, reg, 1e-4, interpret=True
    )
    assert K_p.shape == K_s.shape and k_p.shape == k_s.shape
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_s), rtol=2e-3, atol=2e-4)


def test_pallas_riccati_nonpower_sizes():
    """Odd sizes exercise the padding paths."""
    A, B, quad = random_problem(N=4, nx=13, nu=5)
    reg = jnp.float32(1e-5)
    K_s, k_s = backward_pass(A, B, quad, reg, 1e-4)
    K_p, k_p = backward_pass_pallas(
        A, B, quad.lx, quad.lu, quad.lxx, quad.luu, reg, 1e-4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_s), rtol=2e-3, atol=2e-4)


def test_assoc_riccati_matches_scan():
    """The O(log N) associative-scan backward pass must equal the serial
    recursion (exact-arithmetic equivalence via Woodbury; f32 round-off)."""
    from mpc_ilqr_tpu.ops.assoc_riccati import backward_pass_assoc

    A, B, quad = random_problem(N=25, nx=51, nu=19)
    reg = jnp.float32(1e-6)
    K_s, k_s = backward_pass(A, B, quad, reg, 1e-4)
    K_a, k_a = backward_pass_assoc(A, B, quad, reg)
    np.testing.assert_allclose(np.asarray(K_a), np.asarray(K_s), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_s), rtol=2e-3, atol=2e-4)


def test_assoc_riccati_long_horizon_f64():
    """N=100 in f64: tight agreement over a long recursion."""
    import jax

    from mpc_ilqr_tpu.ops.assoc_riccati import backward_pass_assoc
    from mpc_ilqr_tpu.costs.quadratics import CostQuadratics

    rng = np.random.default_rng(1)
    N, nx, nu = 100, 12, 5
    A = jnp.asarray(np.eye(nx) + 0.01 * rng.normal(size=(N, nx, nx)))
    B = jnp.asarray(0.02 * rng.normal(size=(N, nx, nu)))
    quad = CostQuadratics(
        lx=jnp.asarray(rng.normal(size=(N + 1, nx))),
        lu=jnp.asarray(rng.normal(size=(N, nu))),
        lxx=jnp.asarray(np.einsum("ti,ij->tij", rng.uniform(0.5, 3, (N + 1, nx)), np.eye(nx))),
        luu=jnp.asarray(np.einsum("ti,ij->tij", rng.uniform(0.05, 1, (N, nu)), np.eye(nu))),
    )
    reg = jnp.asarray(1e-6, jnp.float64)
    K_s, k_s = backward_pass(A, B, quad, reg, 1e-4)
    K_a, k_a = backward_pass_assoc(A, B, quad, reg)
    np.testing.assert_allclose(np.asarray(K_a), np.asarray(K_s), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_s), rtol=1e-8, atol=1e-9)


def test_quat_fk_matches_matrix_fk():
    """The Mosaic-safe quaternion/one-hot FK (ops/quat_fk.py, round-2 kernel
    prep) must reproduce the production matrix FK on H1 and H1-with-hand."""
    import os

    from mpc_ilqr_tpu.dynamics import math as qm
    from mpc_ilqr_tpu.dynamics.kinematics import forward_kinematics
    from mpc_ilqr_tpu.models.robot import H1_SCENE_XML, load_h1, load_robot
    from mpc_ilqr_tpu.ops.quat_fk import build_level_plans, quat_frames

    rng = np.random.default_rng(11)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    models = [
        load_h1(dtype=jnp.float64),
        load_robot(
            os.path.join(root, "robots/h1_description/mjcf/h1_with_hand.xml"),
            dtype=jnp.float64,
        ),
    ]
    for model in models:
        plans = build_level_plans(model)
        q = np.zeros(model.nq)
        q[:3] = rng.normal(size=3)
        quat = rng.normal(size=4)
        q[3:7] = quat / np.linalg.norm(quat)
        q[7:] = rng.normal(0, 0.5, model.nq - 7)
        qj = jnp.asarray(q)
        Q, P = quat_frames(model, plans, qj)
        fr = forward_kinematics(model, qj)
        np.testing.assert_allclose(np.asarray(P), np.asarray(fr.p), atol=1e-12)
        R_from_quat = np.asarray(qm.quat_to_mat(Q))
        np.testing.assert_allclose(R_from_quat, np.asarray(fr.R), atol=1e-12)


def test_mosaic_safe_step_matches_engine():
    """The Pallas-ready step formulation (ops/quat_step.py: quaternion-only
    algebra, one-hot gathers, masked solve) equals engine.step exactly."""
    import jax.numpy as jnp2

    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.models.robot import load_h1, standing_state
    from mpc_ilqr_tpu.ops.quat_step import build_step_plan, step_mosaic

    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02, dtype=jnp2.float64)
    plan = build_step_plan(model)
    rng = np.random.default_rng(5)
    x = standing_state(model)
    x = x.at[7:26].add(jnp2.asarray(rng.normal(0, 0.2, 19)))
    x = x.at[model.nq :].add(jnp2.asarray(rng.normal(0, 0.3, model.nv)))
    u = jnp2.asarray(rng.normal(0, 3.0, model.nu))
    xa = engine.step(model, x, u)
    xb = step_mosaic(model, plan, x, u)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xa), atol=1e-10)
    # and with substeps
    xa2 = engine.step(model, x, u, 2)
    xb2 = step_mosaic(model, plan, x, u, 2)
    np.testing.assert_allclose(np.asarray(xb2), np.asarray(xa2), atol=1e-10)


def test_pallas_rollout_kernel_interpret():
    """Whole-rollout Pallas kernel (experimental): interpret-mode equivalence
    with the XLA rollout (and compiles + matches on real TPU hardware,
    verified on-chip in round 2: 0.615 ms vs 2.0 ms at N=25)."""
    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.ilqr.solver import ILQRConfig, rollout
    from mpc_ilqr_tpu.models.robot import load_h1, standing_state
    from mpc_ilqr_tpu.ops.quat_step import build_step_plan
    from mpc_ilqr_tpu.ops.rollout_kernel import rollout_pallas

    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02)
    plan = build_step_plan(model)
    x0 = standing_state(model)
    u = engine.gravity_comp(model, x0)
    us = jnp.tile(u[None], (8, 1))
    xs_ref = rollout(model, ILQRConfig(N=8), x0, us)
    xs_pal = rollout_pallas(model, plan, x0, us, interpret=True)
    np.testing.assert_allclose(
        np.asarray(xs_pal), np.asarray(xs_ref, dtype=np.float32), atol=2e-4
    )


def test_linesearch_rollout_kernel_interpret_matches_xla():
    """Closed-loop (feedback) line-search rollout kernel == the solver's
    vmapped XLA scan, for all 8 alphas (interpret mode)."""
    from mpc_ilqr_tpu.costs.params import build_cost_params
    from mpc_ilqr_tpu.dynamics import engine
    from mpc_ilqr_tpu.ilqr.solver import ILQRConfig, rollout
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.models.robot import load_h1, standing_state
    from mpc_ilqr_tpu.ops.quat_step import build_step_plan
    from mpc_ilqr_tpu.ops.rollout_kernel import linesearch_rollout_pallas
    import os

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02)
    plan = build_step_plan(model)
    cfg = ILQRConfig(N=6)
    x0 = standing_state(model)
    rng = np.random.default_rng(0)
    ubar = jnp.asarray(
        np.asarray(engine.gravity_comp(model, x0))[None]
        + 0.1 * rng.normal(0, 1, (cfg.N, model.nu)),
        jnp.float32,
    )
    xbar = rollout(model, cfg, x0, ubar)
    K = jnp.asarray(0.01 * rng.normal(0, 1, (cfg.N, model.nu, model.nx)), jnp.float32)
    kff = jnp.asarray(0.1 * rng.normal(0, 1, (cfg.N, model.nu)), jnp.float32)
    alphas = jnp.asarray(cfg.alphas, jnp.float32)

    xs_pal, us_pal = linesearch_rollout_pallas(
        model, plan, x0, xbar, ubar, K, kff, alphas, interpret=True
    )

    def roll_one(alpha):
        def f(x, inp):
            xb, ub, K_t, k_t = inp
            u = ub + alpha * k_t + jnp.matmul(K_t, x - xb,
                                              precision=jax.lax.Precision.HIGHEST)
            xn = engine.step(model, x, u)
            return xn, (xn, u)

        _, (xs_tail, us) = jax.lax.scan(f, x0, (xbar[:-1], ubar, K, kff))
        return jnp.concatenate([x0[None], xs_tail], axis=0), us

    xs_ref, us_ref = jax.vmap(roll_one)(alphas)
    np.testing.assert_allclose(np.asarray(us_pal), np.asarray(us_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(xs_pal), np.asarray(xs_ref), atol=2e-4)
