"""Cost-magnitude parity vs the reference (VERDICT r1 item 5).

The reference README publishes `Step 0/15 | Cost: 16.27` for the stock
config. tools/reference_oracle.py re-implements the C++ pipeline
(computeTotalCost, FD linearization, Riccati, first-accept line search —
ilqr.cpp:363-518, 521-660) against real MuJoCo physics. Findings, recorded
in PARITY.md "Cost parity investigation":

  oracle, stock config (walking refs from standing pose): 12,108
  oracle, standing refs:                        initial 107.7 -> solved 1.09
  oracle, legacy q_ref/v_ref:                   55,218 (no improving step)
  this framework, standing refs:                solved 0.91

i.e. 16.27 is not reproducible from the shipped code+config+data; the
framework's 0.91 agrees with the MuJoCo-faithful oracle (1.09) up to the
documented contact-model and Gauss-Newton-Hessian differences.

The fast test below pins OUR line-search cost function term-by-term against
the oracle's computeTotalCost on a common trajectory; the slow test pins
the solved standing cost against the oracle's 1.09.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from reference_oracle import stock_oracle  # noqa: E402

from mpc_ilqr_tpu.costs.params import build_cost_params  # noqa: E402
from mpc_ilqr_tpu.costs.quadratics import trajectory_cost  # noqa: E402
from mpc_ilqr_tpu.costs.references import extract_window  # noqa: E402
from mpc_ilqr_tpu.io.config import load_config  # noqa: E402
from mpc_ilqr_tpu.io.references import load_reference_set  # noqa: E402
from mpc_ilqr_tpu.models.robot import load_h1, standing_state  # noqa: E402


@pytest.fixture(scope="module")
def oracle():
    return stock_oracle(
        q_ref_csv=os.path.join(ROOT, "data/q_standing.csv"),
        v_ref_csv=os.path.join(ROOT, "data/v_standing.csv"),
        contact_csv=os.path.join(ROOT, "data/contact_standing.csv"),
    )


def test_line_search_cost_matches_oracle(oracle):
    """trajectory_cost(mode='reference') == the C++ computeTotalCost
    (numpy+mujoco oracle) on the same trajectory, to float64 accuracy."""
    app = load_config(os.path.join(ROOT, "config.yaml"))
    model = load_h1(gravity=(0.0, 0.0, -1.0), timestep=0.02, dtype=jnp.float64)
    cp = build_cost_params(model, app.mpc.cost_weights, app.mpc.constraints,
                           dtype=jnp.float64)
    refs = load_reference_set(
        model,
        os.path.join(ROOT, "data/q_standing.csv"),
        os.path.join(ROOT, "data/v_standing.csv"),
        os.path.join(ROOT, "data/contact_standing.csv"),
        dtype=jnp.float64,
    )
    N = oracle.N
    win = extract_window(refs, jnp.zeros((), jnp.int32), N)

    # A dynamically-plausible, non-trivial trajectory: the oracle's cold
    # start (gravity comp rollout through real MuJoCo).
    x0 = oracle.standing_state()
    u_grav = oracle.gravity_comp(x0)
    us = np.tile(u_grav, (N, 1))
    xs = np.zeros((N + 1, oracle.nx))
    xs[0] = x0
    for t in range(N):
        xs[t + 1] = oracle.rollout_one_step(xs[t], us[t])

    idx = np.minimum(np.arange(N + 1), len(oracle.x_ref_full) - 1)
    c_oracle, terms = oracle.total_cost(
        xs, us, oracle.x_ref_full[idx], oracle.u_ref_full[idx[:N]], breakdown=True
    )
    c_ours = float(
        trajectory_cost(model, cp, win, jnp.asarray(xs), jnp.asarray(us),
                        mode="reference")
    )
    # CoM inside the balance term comes from our FK (pinned to MuJoCo at
    # 1e-9 elsewhere); everything else is closed-form — tight tolerance.
    np.testing.assert_allclose(c_ours, c_oracle, rtol=1e-6), terms


@pytest.mark.slow
def test_step0_solved_cost_matches_oracle(oracle):
    """Full step-0 solve parity: our solver's standing cost (~0.91) must be
    in-family with the MuJoCo-faithful oracle (~1.09). Slow (FD linearization
    = 1,775 mj_step calls per iteration)."""
    xs, us, cost, cost0 = oracle.solve(oracle.standing_state())
    assert 0.5 < cost < 2.0, f"oracle solved cost {cost} drifted"

    app = load_config(os.path.join(ROOT, "config.yaml"))
    model = load_h1(gravity=(0.0, 0.0, -1.0), timestep=0.02, dtype=jnp.float64)
    cp = build_cost_params(model, app.mpc.cost_weights, app.mpc.constraints,
                           dtype=jnp.float64)
    refs = load_reference_set(
        model,
        os.path.join(ROOT, "data/q_standing.csv"),
        os.path.join(ROOT, "data/v_standing.csv"),
        os.path.join(ROOT, "data/contact_standing.csv"),
        dtype=jnp.float64,
    )
    from mpc_ilqr_tpu.ilqr import solver as ilqr
    from mpc_ilqr_tpu.dynamics import engine

    cfg = ilqr.ILQRConfig(N=oracle.N)
    win = extract_window(refs, jnp.zeros((), jnp.int32), cfg.N)
    x0 = standing_state(model)
    ubar = jnp.tile(engine.gravity_comp(model, x0)[None], (cfg.N, 1))
    sol = jax.jit(lambda: ilqr.solve(model, cp, cfg, x0, win, ubar))()
    assert bool(sol.success)
    # Same cost family (the contact models differ; see PARITY.md).
    assert abs(float(sol.cost) - cost) < 0.75 * cost
