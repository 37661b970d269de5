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
