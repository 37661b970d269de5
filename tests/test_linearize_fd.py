"""AD vs batched-FD linearization agreement (SURVEY §7 hard part 2)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.dynamics import engine
from mpc_ilqr_tpu.ilqr import solver as ilqr
from mpc_ilqr_tpu.models.robot import load_h1, standing_state


def test_ad_and_fd_linearization_agree():
    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02, dtype=jnp.float64)
    cfg_ad = ilqr.ILQRConfig(N=3, linearization="ad")
    cfg_fd = dataclasses.replace(cfg_ad, linearization="fd", fd_eps=1e-6)
    x0 = standing_state(model)
    us = jnp.tile(engine.gravity_comp(model, x0)[None], (3, 1))
    xs = ilqr.rollout(model, cfg_ad, x0, us)
    A_ad, B_ad = ilqr.linearize(model, cfg_ad, xs, us)
    A_fd, B_fd = ilqr.linearize(model, cfg_fd, xs, us)
    # Standing state is in contact: both must agree through the smooth
    # contact model (the whole point of building it C0-smooth).
    np.testing.assert_allclose(np.asarray(A_ad), np.asarray(A_fd), atol=5e-4)  # FD truncation at active contact
    np.testing.assert_allclose(np.asarray(B_ad), np.asarray(B_fd), atol=5e-4)  # FD truncation at active contact
    # Stiff implicit contact makes some ∂v'/∂q entries O(h·k/m) ≈ 10-20;
    # just require boundedness.
    assert float(jnp.abs(A_ad).max()) < 100.0


def test_frozen_mass_linearization_close_to_exact():
    """linearization="ad_frozen_mass" (zero tangents through M(q) — the DDP
    approximation that removes the dominant fleet-scale jvp tensor) must stay
    CLOSE to the exact AD Jacobians at the standing state: the dropped
    dM/dq terms are O(h * dM * v) and vanish at v=0, so at standing the
    difference comes only through the solve's lhs sensitivity."""
    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02, dtype=jnp.float64)
    cfg_ad = ilqr.ILQRConfig(N=3, linearization="ad")
    cfg_fz = dataclasses.replace(cfg_ad, linearization="ad_frozen_mass")
    x0 = standing_state(model)
    us = jnp.tile(engine.gravity_comp(model, x0)[None], (3, 1))
    xs = ilqr.rollout(model, cfg_ad, x0, us)
    A_ad, B_ad = ilqr.linearize(model, cfg_ad, xs, us)
    A_fz, B_fz = ilqr.linearize(model, cfg_fz, xs, us)
    # B (control Jacobian) is M-frozen-exact: tau enters the rhs only.
    np.testing.assert_allclose(np.asarray(B_fz), np.asarray(B_ad), atol=1e-9)
    # A differs only in the dM/dq coupling; small at near-zero velocity.
    assert float(jnp.abs(A_fz - A_ad).max()) < 0.05
    # And an actual solve still converges to the same cost (the H1 standing
    # problem, short horizon).
    from mpc_ilqr_tpu.costs.params import build_cost_params
    from mpc_ilqr_tpu.costs.references import extract_window
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.io.references import load_reference_set
    import os

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    app = load_config(os.path.join(ROOT, "config.yaml"))
    cp = build_cost_params(model, app.mpc.cost_weights, app.mpc.constraints,
                           dtype=jnp.float64)
    refs = load_reference_set(
        model,
        os.path.join(ROOT, "data/q_standing.csv"),
        os.path.join(ROOT, "data/v_standing.csv"),
        os.path.join(ROOT, "data/contact_standing.csv"),
        dtype=jnp.float64,
    )
    cfgs = ilqr.ILQRConfig(N=6, max_iterations=3)
    win = extract_window(refs, jnp.zeros((), jnp.int32), cfgs.N)
    ubar = jnp.tile(engine.gravity_comp(model, x0)[None], (cfgs.N, 1))
    sol_ad = ilqr.solve(model, cp, cfgs, x0, win, ubar)
    sol_fz = ilqr.solve(
        model, cp, dataclasses.replace(cfgs, linearization="ad_frozen_mass"),
        x0, win, ubar,
    )
    assert bool(sol_fz.success)
    np.testing.assert_allclose(float(sol_fz.cost), float(sol_ad.cost), rtol=0.02)


def test_scan_outer_loop_matches_while():
    """outer_loop="scan" (fixed-trip masked iterations, the fleet mode) must
    produce the same solution as the early-exit while loop."""
    from mpc_ilqr_tpu.costs.params import build_cost_params
    from mpc_ilqr_tpu.costs.references import extract_window
    from mpc_ilqr_tpu.io.config import load_config
    from mpc_ilqr_tpu.io.references import load_reference_set
    import os

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02, dtype=jnp.float64)
    app = load_config(os.path.join(ROOT, "config.yaml"))
    cp = build_cost_params(model, app.mpc.cost_weights, app.mpc.constraints,
                           dtype=jnp.float64)
    refs = load_reference_set(
        model,
        os.path.join(ROOT, "data/q_standing.csv"),
        os.path.join(ROOT, "data/v_standing.csv"),
        os.path.join(ROOT, "data/contact_standing.csv"),
        dtype=jnp.float64,
    )
    x0 = standing_state(model)
    cfg_w = ilqr.ILQRConfig(N=6, max_iterations=3)
    cfg_s = dataclasses.replace(cfg_w, outer_loop="scan")
    win = extract_window(refs, jnp.zeros((), jnp.int32), cfg_w.N)
    ubar = jnp.tile(engine.gravity_comp(model, x0)[None], (cfg_w.N, 1))
    sol_w = ilqr.solve(model, cp, cfg_w, x0, win, ubar)
    sol_s = ilqr.solve(model, cp, cfg_s, x0, win, ubar)
    np.testing.assert_allclose(float(sol_s.cost), float(sol_w.cost), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sol_s.ubar), np.asarray(sol_w.ubar), atol=1e-10)
    assert int(sol_s.iterations) == int(sol_w.iterations)


def test_lin_chunk_matches_full_width():
    """cfg.lin_chunk (direction-chunked linearize, the knob that fits a
    fully-vmapped 1024-fleet solve in HBM) must be numerically identical to
    the full-width batch in BOTH modes — it only reorders the lax.map/vmap
    structure, never the math. Includes a non-dividing chunk (padding)."""
    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02, dtype=jnp.float64)
    x0 = standing_state(model)
    us = jnp.tile(engine.gravity_comp(model, x0)[None], (3, 1))
    for mode, eps in (("ad", None), ("ad_frozen_mass", None), ("fd", 1e-6)):
        cfg0 = ilqr.ILQRConfig(N=3, linearization=mode,
                               **({"fd_eps": eps} if eps else {}))
        xs = ilqr.rollout(model, cfg0, x0, us)
        A0, B0 = ilqr.linearize(model, cfg0, xs, us)
        for chunk in (10, 16):  # 16 does not divide nx+nu=70 -> padded
            cfg = dataclasses.replace(cfg0, lin_chunk=chunk)
            A, B = ilqr.linearize(model, cfg, xs, us)
            # Identical math; only the vmap/lax.map batch structure differs.
            # XLA reassociates reductions per batch shape, so f64 entries
            # drift at ~1e-10 — and fd divides that eval noise by eps=1e-6,
            # hence its looser pin.
            tol = 1e-6 if mode == "fd" else 1e-8
            np.testing.assert_allclose(np.asarray(A), np.asarray(A0),
                                       atol=tol, err_msg=f"{mode}/{chunk}")
            np.testing.assert_allclose(np.asarray(B), np.asarray(B0),
                                       atol=tol, err_msg=f"{mode}/{chunk}")


def _structured_vs_ad(model, x0, us, n_substeps=1, atol=1e-10):
    cfg = ilqr.ILQRConfig(N=us.shape[0], linearization="ad", n_substeps=n_substeps)
    xs = ilqr.rollout(model, cfg, x0, us)
    A0, B0 = ilqr.linearize(model, cfg, xs, us)
    cfg_s = dataclasses.replace(cfg, linearization="structured")
    A1, B1 = ilqr.linearize(model, cfg_s, xs, us)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0), atol=atol)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B0), atol=atol)
    return xs, cfg


def test_structured_linearization_exact_h1():
    """linearization="structured" (engine.step_and_jac: analytic u-block,
    bias/viscosity-only v-block tangents against one shared factorization,
    full jvp for the nq q-block only) is the SAME chain rule regrouped by
    the substep's block structure — must match "ad" to machine epsilon,
    at a state with active contact AND nonzero velocity."""
    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02, dtype=jnp.float64)
    x0 = standing_state(model) + 0.01 * jnp.sin(jnp.arange(model.nx) * 0.7)
    us = jnp.tile(engine.gravity_comp(model, standing_state(model))[None], (3, 1)) + 0.5
    xs, cfg = _structured_vs_ad(model, x0, us)

    # frozen-mass variant: must match ad_frozen_mass exactly (the frozen
    # q-block is the ONLY place dM/dq ever entered).
    cfg_f = dataclasses.replace(cfg, linearization="ad_frozen_mass")
    cfg_sf = dataclasses.replace(cfg, linearization="structured_frozen_mass")
    A_f, B_f = ilqr.linearize(model, cfg_f, xs, us)
    A_sf, B_sf = ilqr.linearize(model, cfg_sf, xs, us)
    np.testing.assert_allclose(np.asarray(A_sf), np.asarray(A_f), atol=1e-10)
    np.testing.assert_allclose(np.asarray(B_sf), np.asarray(B_f), atol=1e-10)

    # q-block direction chunking (cfg.lin_chunk; 7 does not divide nq=26).
    cfg_c = dataclasses.replace(cfg, linearization="structured", lin_chunk=7)
    A_c, B_c = ilqr.linearize(model, cfg_c, xs, us)
    A_s, _ = ilqr.linearize(model, dataclasses.replace(cfg, linearization="structured"), xs, us)
    np.testing.assert_allclose(np.asarray(A_c), np.asarray(A_s), atol=1e-8)


def test_structured_linearization_substeps():
    """n_substeps>1 composes per-substep Jacobians (A←A_k A, B←A_k B + B_k)
    with the substep-scaled h everywhere, including inside the q-block jvp."""
    model = load_h1(gravity=(0, 0, -9.81), timestep=0.02, dtype=jnp.float64)
    x0 = standing_state(model) + 0.01 * jnp.sin(jnp.arange(model.nx) * 0.7)
    us = jnp.tile(engine.gravity_comp(model, standing_state(model))[None], (2, 1))
    # Stiff contact at physical gravity: |A| entries reach ~1e1, and the
    # two-substep product squares the conditioning — pin absolute 1e-9
    # relative to that scale via a scaled comparison.
    cfg = ilqr.ILQRConfig(N=2, linearization="ad", n_substeps=2)
    xs = ilqr.rollout(model, cfg, x0, us)
    A0, B0 = ilqr.linearize(model, cfg, xs, us)
    cfg_s = dataclasses.replace(cfg, linearization="structured")
    A1, B1 = ilqr.linearize(model, cfg_s, xs, us)
    scale = float(jnp.abs(A0).max())
    np.testing.assert_allclose(np.asarray(A1) / scale, np.asarray(A0) / scale, atol=1e-12)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B0), atol=1e-12)


def test_structured_linearization_generality_models(tmp_path):
    """Structured mode is model-generic: slide (cartpole, ncp=0 fixed base)
    and ball-joint chains go through the same block math."""
    from mpc_ilqr_tpu.models.robot import load_robot
    from tests.test_model_generality import BALL_CHAIN_XML, CARTPOLE_XML

    for name, xml in (("cartpole.xml", CARTPOLE_XML), ("chain.xml", BALL_CHAIN_XML)):
        p = tmp_path / name
        p.write_text(xml)
        model = load_robot(str(p), dtype=jnp.float64)
        x0 = jnp.asarray(0.05 * np.sin(np.arange(model.nx) * 1.3), jnp.float64)
        us = jnp.asarray(0.1 * np.ones((2, model.nu)), jnp.float64)
        _structured_vs_ad(model, x0, us)
