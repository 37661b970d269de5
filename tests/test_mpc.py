"""MPC controller tests: closed-loop standing, warm start, reset, TV-LQR,
checkpointability of the carry (SURVEY §5 checkpoint/resume)."""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ilqr_tpu.costs.params import build_cost_params
from mpc_ilqr_tpu.dynamics import engine
from mpc_ilqr_tpu.ilqr.solver import ILQRConfig
from mpc_ilqr_tpu.io.config import load_config
from mpc_ilqr_tpu.io.references import load_reference_set
from mpc_ilqr_tpu.models.robot import load_h1, standing_state
from mpc_ilqr_tpu.mpc import controller

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def prob():
    app = load_config(os.path.join(ROOT, "config.yaml"))
    model = load_h1(gravity=tuple(app.mpc.gravity), timestep=0.02, dtype=jnp.float32)
    cp = build_cost_params(model, app.mpc.cost_weights, app.mpc.constraints, dtype=jnp.float32)
    # Small horizon / iteration budget: keeps CPU compile time testable.
    cfg = ILQRConfig(N=6, max_iterations=3)
    refs = load_reference_set(
        model,
        os.path.join(ROOT, "data/q_standing.csv"),
        os.path.join(ROOT, "data/v_standing.csv"),
        os.path.join(ROOT, "data/contact_standing.csv"),
        dtype=jnp.float32,
    )
    step_once = jax.jit(functools.partial(controller.step_once, model, cp, cfg))
    return model, cp, cfg, refs, step_once


def test_closed_loop_standing(prob):
    model, cp, cfg, refs, step_once = prob
    x = standing_state(model)
    state = controller.init_state(model, cfg)
    plant = jax.jit(lambda xx, uu: engine.step(model, xx, uu))
    costs = []
    for i in range(8):
        state, u, diag = step_once(refs, state, x)
        assert bool(diag.solve_ok), f"solve failed at step {i}"
        x = plant(x, u)
        costs.append(float(diag.cost))
        assert np.isfinite(np.asarray(x)).all()
    # Base stays near standing height, cost decreases overall.
    assert 1.0 < float(x[2]) < 1.1
    assert costs[-1] < costs[0]
    # t_idx advanced, warm start engaged
    assert int(state.t_idx) == 8
    assert bool(state.has_prev)


def test_closed_loop_standing_structured_gn(prob):
    """Closed-loop MPC with the round-3 candidate flagship solver numerics
    (structured_frozen_mass linearization + Gauss-Newton cost Hessians):
    same stabilization quality as the default config on the standing task.
    Covers the config flip before any hardware default changes."""
    model, cp, cfg0, refs, _ = prob
    import dataclasses

    cfg = dataclasses.replace(cfg0, linearization="structured_frozen_mass",
                              quad_mode="gn")
    step_once = jax.jit(functools.partial(controller.step_once, model, cp, cfg))
    x = standing_state(model)
    state = controller.init_state(model, cfg)
    plant = jax.jit(lambda xx, uu: engine.step(model, xx, uu))
    costs = []
    for i in range(8):
        state, u, diag = step_once(refs, state, x)
        assert bool(diag.solve_ok), f"solve failed at step {i}"
        x = plant(x, u)
        costs.append(float(diag.cost))
        assert np.isfinite(np.asarray(x)).all()
    assert 1.0 < float(x[2]) < 1.1
    assert costs[-1] < costs[0]


def test_reset(prob):
    model, cp, cfg, refs, step_once = prob
    state = controller.init_state(model, cfg)
    x = standing_state(model)
    state, _, _ = step_once(refs, state, x)
    state = controller.reset(state, cfg)
    assert int(state.t_idx) == 0
    assert not bool(state.has_prev)
    assert float(jnp.abs(state.prev_ubar).max()) == 0.0


def test_tvlqr_between_solves(prob):
    """computeTVLQRControl semantics (mpc.cpp:168-179): zero without a
    previous solution, first-gain feedback with one."""
    model, cp, cfg, refs, step_once = prob
    x = standing_state(model)
    state = controller.init_state(model, cfg)
    u0 = controller.tvlqr_control(state, x)
    assert float(jnp.abs(u0).max()) == 0.0
    state, u_apply, _ = step_once(refs, state, x)
    u1 = controller.tvlqr_control(state, x)
    expect = state.prev_ubar[0] + state.prev_K[0] @ (x - state.prev_xbar[0])
    np.testing.assert_allclose(np.asarray(u1), np.asarray(expect), rtol=1e-5)


def test_state_checkpoint_roundtrip(prob):
    """The MPC carry is an explicit pytree -> trivially checkpointable
    (the reference's warm-start store is process-memory only)."""
    model, cp, cfg, refs, step_once = prob
    x = standing_state(model)
    state = controller.init_state(model, cfg)
    state, _, _ = step_once(refs, state, x)

    flat, treedef = jax.tree.flatten(state)
    blobs = [np.asarray(l) for l in flat]  # "serialize"
    restored = jax.tree.unflatten(treedef, [jnp.asarray(b) for b in blobs])

    # Continuing from the restored state gives the identical next step.
    s1, u1, d1 = step_once(refs, state, x)
    s2, u2, d2 = step_once(refs, restored, x)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(s1.prev_ubar), np.asarray(s2.prev_ubar))


def test_failure_fallback_zero_control(prob):
    """NaN measured state must not produce NaN control (mpc.cpp:82-91 +
    humanoid_mpc.cpp:162-165 fallbacks)."""
    model, cp, cfg, refs, step_once = prob
    x_bad = standing_state(model).at[0].set(jnp.nan)
    state = controller.init_state(model, cfg)
    state, u, diag = step_once(refs, state, x_bad)
    assert not bool(diag.solve_ok)
    assert np.isfinite(np.asarray(u)).all()  # fallback control is finite (zeros)


def test_fused_loop_matches_host_loop(prob):
    """run_closed_loop (one lax.scan) must reproduce the host-driven loop
    step for step — the fusion is a scheduling change, not a semantic one."""
    import functools

    model, cp, cfg, refs, step_once = prob
    x0 = standing_state(model)
    n = 4

    run = jax.jit(
        functools.partial(controller.run_closed_loop, model, cp, cfg),
        static_argnames=("n_steps",),
    )
    state0 = controller.init_state(model, cfg)
    _, x_fused, hist = run(refs, state0, x0, n_steps=n)

    plant = jax.jit(lambda xx, uu: engine.step(model, xx, uu))
    state = controller.init_state(model, cfg)
    x = x0
    for i in range(n):
        state, u, diag = step_once(refs, state, x)
        np.testing.assert_allclose(
            np.asarray(hist["u"][i]), np.asarray(u), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            float(hist["cost"][i]), float(diag.cost), rtol=2e-4
        )
        x = plant(x, u)
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x), rtol=2e-3, atol=1e-4)


def test_real_gravity_standing_with_substeps():
    """Physical gravity (-9.81): with physics_dt=0.005 (4 substeps per
    control step) the closed loop holds the stand on the built-in plant.
    (At the stock single-substep 0.02 the 10x contact loads chatter — the
    same physics_dt knob the reference exposes is the fix.)"""
    app = load_config(os.path.join(ROOT, "config.yaml"))
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    app.mpc.gravity = [0.0, 0.0, -9.81]
    app.mpc.physics_dt = 0.005
    from mpc_ilqr_tpu.mpc import runner

    prob = runner.setup(app)
    prob = prob._replace(cfg=dataclasses.replace(prob.cfg, N=6, max_iterations=3))
    hist, _ = runner.run_simulation(prob, sim_steps=8, verbose=False)
    z = [x[2] for x in hist["x"]]
    assert min(z) > 1.0
    assert hist["cost"][-1] < 100.0


def test_setup_builds_plan_for_pallas_batched_ls(monkeypatch):
    """runner.setup must build the StepPlan whenever ANY Mosaic kernel is
    selected — including ls_backend="pallas_batched" ALONE (regression: the
    gate once checked only "pallas", so with rollout_backend="xla" the
    batched-alpha kernel silently fell back to the XLA line search)."""
    from mpc_ilqr_tpu.mpc import runner

    app = load_config(os.path.join(ROOT, "config.yaml"))
    app.q_ref_path = "data/q_standing.csv"
    app.v_ref_path = "data/v_standing.csv"
    app.contact_schedule_path = "data/contact_standing.csv"
    app.engine["rollout_backend"] = "xla"
    app.engine["ls_backend"] = "pallas_batched"
    app.engine["dtype"] = "float32"
    # The gate keys on the runtime backend (Mosaic programs need a TPU);
    # pretend we are on one — build_step_plan itself is host-side numpy.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    prob = runner.setup(app)
    assert prob.plan is not None

    # And on a CPU backend the plan must stay None (kernels can't lower).
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    prob_cpu = runner.setup(app)
    assert prob_cpu.plan is None


def test_tvlqr_amortized_loop_matches_closed_loop_semantics(prob):
    """The bench-suite amortized 100 Hz loop (solve every k-th step, TV-LQR
    gains in between — the reference's MPC::computeTVLQRControl mechanism,
    mpc.cpp:168-179) is a driver metric path (bench.py long_horizon_amortized):
    pin that it runs a REAL closed loop — solves succeed, t_idx stays
    time-aligned across the skip steps, and the plant stays upright."""
    import sys
    import types

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from bench_suite import _tvlqr_amortized_loop

    model, cp, cfg, refs, _ = prob
    p = types.SimpleNamespace(model=model, cp=cp, cfg=cfg, refs=refs, plan=None)
    run = _tvlqr_amortized_loop(p, solve_every=2)

    x0 = standing_state(model)
    state0 = controller.init_state(model, cfg)
    state, xT, hist = jax.jit(functools.partial(run, n_steps=6))(refs, state0, x0)

    assert np.asarray(hist["solve_ok"]).all()
    assert np.isfinite(np.asarray(xT)).all()
    # 6 control steps = 3 solve cycles; skip steps advance t_idx too.
    assert hist["cost"].shape == (3,)
    assert int(state.t_idx) == 6
    assert 1.0 < float(xT[2]) < 1.1
    # quality: the amortized loop keeps improving, not diverging
    assert float(hist["cost"][-1]) < float(hist["cost"][0])
