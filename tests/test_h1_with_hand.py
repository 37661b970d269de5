"""Second model variant: H1 with dexterous hands (47 bodies, nq=52, nu=45).

Proves the engine is model-general, not H1-hardcoded: the same parser /
kinematics / dynamics handle the bigger tree and still match the MuJoCo
oracle.
"""
import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mpc_ilqr_tpu.dynamics import engine, kinematics
from mpc_ilqr_tpu.models.robot import load_robot

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
XML = os.path.join(ROOT, "robots", "h1_description", "mjcf", "h1_with_hand.xml")

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def pair():
    m = mujoco.MjModel.from_xml_path(XML)
    model = load_robot(XML, ee_body_names=("left_ankle_link", "right_ankle_link"),
                       dtype=jnp.float64)
    return m, mujoco.MjData(m), model


def test_dims(pair):
    m, _, model = pair
    assert (model.nq, model.nv, model.nu) == (m.nq, m.nv, m.nu)
    assert model.nbody == m.nbody - 1
    np.testing.assert_allclose(np.asarray(model.body_mass), m.body_mass[1:], rtol=1e-9)


def test_fk_and_mass_matrix(pair):
    m, d, model = pair
    q = np.zeros(m.nq)
    q[:3] = [0.1, -0.2, 1.2]
    quat = RNG.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    lo, hi = m.jnt_range[1:, 0], m.jnt_range[1:, 1]
    span = np.where(np.isfinite(hi - lo) & (hi > lo), hi - lo, 1.0)
    base = np.where(np.isfinite(lo), lo, -0.5)
    q[7:] = base + span * RNG.uniform(0.3, 0.7, m.nq - 7)
    d.qpos[:] = q
    d.qvel[:] = RNG.normal(0, 0.3, m.nv)
    mujoco.mj_forward(m, d)

    fr = kinematics.forward_kinematics(model, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(fr.p), d.xpos[1:], atol=1e-9)

    M = engine.mass_matrix(model, fr)
    Mfull = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mfull)
    np.testing.assert_allclose(np.asarray(M), Mfull, atol=1e-8)

    bias = engine.bias_forces(model, jnp.asarray(q), jnp.asarray(d.qvel))
    np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-7)


def test_step_runs(pair):
    m, _, model = pair
    x = jnp.zeros(model.nx, jnp.float64).at[2].set(1.2).at[3].set(1.0)
    u = jnp.zeros(model.nu, jnp.float64)
    xn = engine.step(model, x, u)
    assert np.isfinite(np.asarray(xn)).all()
