"""Checkpoint/resume + fault-injection knob tests (SURVEY §5)."""
import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.ilqr.solver import ILQRConfig
from mpc_ilqr_tpu.models.robot import load_h1, scale_robot_mass, set_gravity, standing_state
from mpc_ilqr_tpu.mpc import checkpoint, controller


def test_checkpoint_roundtrip(tmp_path):
    model = load_h1(dtype=jnp.float32)
    cfg = ILQRConfig(N=5)
    state = controller.init_state(model, cfg)
    state = state.replace(
        t_idx=jnp.asarray(7, jnp.int32),
        prev_ubar=state.prev_ubar + 1.5,
        has_prev=jnp.asarray(True),
        reg=jnp.asarray(3e-5, jnp.float32),
    )
    p = str(tmp_path / "mpc_state.npz")
    checkpoint.save_state(p, state)
    restored = checkpoint.load_state(p)
    assert int(restored.t_idx) == 7
    assert bool(restored.has_prev)
    np.testing.assert_array_equal(np.asarray(restored.prev_ubar), np.asarray(state.prev_ubar))
    np.testing.assert_allclose(float(restored.reg), 3e-5, rtol=1e-6)


def test_set_time_index():
    model = load_h1(dtype=jnp.float32)
    state = controller.init_state(model, ILQRConfig(N=5))
    state = checkpoint.set_time_index(state, 42)
    assert int(state.t_idx) == 42


def test_mass_scaling_and_gravity():
    model = load_h1(dtype=jnp.float32)
    m2 = scale_robot_mass(model, 1.25)
    np.testing.assert_allclose(
        np.asarray(m2.body_mass), 1.25 * np.asarray(model.body_mass), rtol=1e-6
    )
    m3 = set_gravity(model, 0.0, 0.0, -9.81)
    np.testing.assert_allclose(np.asarray(m3.gravity), [0, 0, -9.81])
    # Heavier robot needs proportionally larger gravity compensation.
    from mpc_ilqr_tpu.dynamics import engine

    x = standing_state(model)
    u1 = np.asarray(engine.gravity_comp(model, x))
    u2 = np.asarray(engine.gravity_comp(m2, x))
    np.testing.assert_allclose(u2, 1.25 * u1, rtol=1e-4)
