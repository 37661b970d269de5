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
