"""Cross-validate the JAX engine against the MuJoCo oracle on the H1 model.

The reference's behavior *is* MuJoCo (robot_utils.cpp wraps mj_forward /
mj_step); these tests pin our parser, kinematics, mass matrix, bias forces,
gravity compensation, and contact-free integration to the same numbers.
Contact dynamics intentionally differ (smooth compliant model vs. MuJoCo's
Newton solver) and are tested separately for qualitative behavior.
"""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mpc_ilqr_tpu.dynamics import engine, kinematics
from mpc_ilqr_tpu.models.robot import H1_SCENE_XML, load_h1, standing_state

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def mj():
    m = mujoco.MjModel.from_xml_path(H1_SCENE_XML)
    m.opt.gravity[:] = [0.0, 0.0, -1.0]  # stock config.yaml gravity
    m.opt.timestep = 0.02
    return m, mujoco.MjData(m)


@pytest.fixture(scope="module")
def model():
    return load_h1(gravity=(0.0, 0.0, -1.0), timestep=0.02, dtype=jnp.float64)


def random_qpos(m, scale=0.3):
    q = np.zeros(m.nq)
    q[:3] = RNG.normal(0, 0.2, 3) + [0, 0, 1.2]
    quat = RNG.normal(0, 1, 4)
    q[3:7] = quat / np.linalg.norm(quat)
    lo, hi = m.jnt_range[1:, 0], m.jnt_range[1:, 1]
    q[7:] = lo + (hi - lo) * RNG.uniform(0.2, 0.8, m.nq - 7)
    return q


def test_model_dims(mj, model):
    m, _ = mj
    assert (model.nq, model.nv, model.nu) == (m.nq, m.nv, m.nu)
    assert model.nbody == m.nbody - 1  # we exclude the world body
    np.testing.assert_allclose(np.asarray(model.body_mass), m.body_mass[1:], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(model.dof_damping), m.dof_damping, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(model.dof_armature), m.dof_armature, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(model.body_inertia), m.body_inertia[1:], rtol=1e-9)
    # actuator mapping: dof addresses and ctrl ranges
    np.testing.assert_array_equal(
        np.array(model.act_dof_adr), m.jnt_dofadr[m.actuator_trnid[:, 0]]
    )
    np.testing.assert_allclose(np.asarray(model.ctrl_range), m.actuator_ctrlrange, rtol=1e-12)


def test_forward_kinematics(mj, model):
    m, d = mj
    for _ in range(5):
        q = random_qpos(m)
        d.qpos[:] = q
        d.qvel[:] = 0
        mujoco.mj_forward(m, d)
        fr = kinematics.forward_kinematics(model, jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(fr.p), d.xpos[1:], atol=1e-9)
        xmats = d.xmat.reshape(-1, 3, 3)[1:]
        np.testing.assert_allclose(np.asarray(fr.R), xmats, atol=1e-9)
        # CoM (mass-weighted xipos — robot_utils.cpp:810-833)
        com_ref = (m.body_mass[1:, None] * d.xipos[1:]).sum(0) / m.body_mass[1:].sum()
        np.testing.assert_allclose(
            np.asarray(kinematics.com_position(model, jnp.asarray(q))), com_ref, atol=1e-9
        )


def test_mass_matrix(mj, model):
    m, d = mj
    q = random_qpos(m)
    d.qpos[:] = q
    mujoco.mj_forward(m, d)
    Mfull = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mfull)
    fr = kinematics.forward_kinematics(model, jnp.asarray(q))
    M = engine.mass_matrix(model, fr)
    np.testing.assert_allclose(np.asarray(M), Mfull, atol=1e-8)


def test_bias_forces(mj, model):
    m, d = mj
    for _ in range(3):
        q = random_qpos(m)
        v = RNG.normal(0, 0.5, m.nv)
        d.qpos[:] = q
        d.qvel[:] = v
        mujoco.mj_forward(m, d)
        bias = engine.bias_forces(model, jnp.asarray(q), jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-7)


def test_com_and_ee_velocity(mj, model):
    m, d = mj
    q = random_qpos(m)
    v = RNG.normal(0, 0.5, m.nv)
    d.qpos[:] = q
    d.qvel[:] = v
    mujoco.mj_forward(m, d)
    # CoM velocity via mj_jacSubtreeCom on body 0 (robot_utils.cpp:383-390)
    jac = np.zeros((3, m.nv))
    mujoco.mj_jacSubtreeCom(m, d, jac, 0)
    np.testing.assert_allclose(
        np.asarray(kinematics.com_velocity(model, jnp.asarray(q), jnp.asarray(v))),
        jac @ v,
        atol=1e-8,
    )
    # EE world linear velocity of ankle body frames (robot_utils.cpp:405-409)
    for k, name in enumerate(["left_ankle_link", "right_ankle_link"]):
        bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, name)
        jp = np.zeros((3, m.nv))
        jr = np.zeros((3, m.nv))
        mujoco.mj_jacBody(m, d, jp, jr, bid)
        ee_v = kinematics.ee_velocities(model, jnp.asarray(q), jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(ee_v[k]), jp @ v, atol=1e-8)


def test_gravity_comp_standing(mj, model):
    m, d = mj
    x = standing_state(model)
    d.qpos[:] = np.asarray(x[: m.nq])
    d.qvel[:] = 0
    mujoco.mj_forward(m, d)
    u = engine.gravity_comp(model, x)
    expect = d.qfrc_bias[6:]  # driver fallback (humanoid_mpc.cpp:157)
    np.testing.assert_allclose(np.asarray(u), expect, atol=1e-8)


def test_contact_free_step_matches_mujoco(mj, model):
    """With the robot in the air, our Euler step must track mj_step closely."""
    m, d = mj
    # Floor contact is excluded by height, but a random joint draw can still
    # SELF-collide (legs crossed etc. — observed ncon=3 at z=3.0, r5 cold
    # run); redraw until MuJoCo reports a genuinely contact-free pose, which
    # is the precondition this test needs, not a property it checks.
    for _ in range(50):
        q = random_qpos(m)
        q[2] = 3.0  # well above the floor: no floor contacts
        v = RNG.normal(0, 0.3, m.nv)
        d.qpos[:] = q
        d.qvel[:] = v
        d.ctrl[:] = RNG.normal(0, 5.0, m.nu)
        mujoco.mj_forward(m, d)
        if d.ncon == 0:
            break
    assert d.ncon == 0, "no contact-free pose in 50 draws — model anomaly"
    x = jnp.concatenate([jnp.asarray(q), jnp.asarray(v)])
    u = jnp.asarray(d.ctrl)
    x_next = engine.step(model, x, u)
    mujoco.mj_step(m, d)
    np.testing.assert_allclose(np.asarray(x_next[: m.nq]), d.qpos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_next[m.nq :]), d.qvel, atol=1e-5)


def test_contact_holds_standing_robot(model):
    """Compliant contact should roughly support the standing robot: after a
    second of passive dynamics with gravity-comp torques, the base stays up."""
    x = standing_state(model)
    u = engine.gravity_comp(model, x)

    def body(x, _):
        return engine.step(model, x, u), None

    xT, _ = jax.lax.scan(body, x, None, length=50)
    assert np.isfinite(np.asarray(xT)).all()
    assert float(xT[2]) > 0.9  # base height stays near 1.04


def test_step_jacobian_finite(model):
    x = standing_state(model)
    u = engine.gravity_comp(model, x)
    A = jax.jacfwd(lambda xx: engine.step(model, xx, u))(x)
    B = jax.jacfwd(lambda uu: engine.step(model, x, uu))(u)
    assert np.isfinite(np.asarray(A)).all() and np.isfinite(np.asarray(B)).all()
    assert A.shape == (model.nx, model.nx) and B.shape == (model.nx, model.nu)


def test_impratio_stiffens_friction(model):
    """contact_impratio maps MuJoCo's frictional-to-normal impedance ratio
    (reference sets 100, robot_utils.cpp:58-63) onto the compliant model's
    stiction regularization: at equal SMALL slip velocity the tangential
    (frictional) reaction must scale up with impratio, while the saturated
    Coulomb limit mu*fn at large slip stays unchanged."""
    x = standing_state(model)

    def tangential_force(ir, vx):
        m = model.replace(contact_impratio=jnp.asarray(ir, jnp.float64))
        xx = x.at[model.nq + 0].set(vx)  # base x velocity -> slip at the soles
        f, _ = engine.contact_forces(m, xx)
        return float(jnp.sum(jnp.abs(f[:, 0])))

    # Small-slip regime: stiction viscosity scales ~sqrt(impratio) (the
    # linear law ill-conditions the f32 implicit solve, see contact_terms).
    soft = tangential_force(1.0, 1e-5)
    hard = tangential_force(100.0, 1e-5)
    assert hard > 5.0 * soft, f"impratio=100 tangential force {hard} !>> {soft}"

    # Saturated regime: the Coulomb limit is impratio-independent.
    sat1 = tangential_force(1.0, 0.05)
    sat2 = tangential_force(100.0, 0.05)
    np.testing.assert_allclose(sat2, sat1, rtol=2e-2)


def test_fullinertia_roundtrip_vs_mujoco(tmp_path):
    """fullinertia diagonalization must preserve the inertia tensor even when
    eigh returns a reflection (det V = -1): pin M(q) against MuJoCo on a body
    specified with off-diagonal inertia (ADVICE r1)."""
    xml = """
<mujoco model="fi"><option timestep="0.01" gravity="0 0 -9.81"/>
<worldbody><body name="blob" pos="0 0 1">
  <inertial pos="0.01 -0.02 0.03" mass="2.5"
            fullinertia="0.09 0.07 0.05 0.02 -0.01 0.015"/>
  <joint name="h1j" axis="0 1 0"/>
  <geom type="sphere" size="0.1" contype="0" conaffinity="0"/>
  <body name="blob2" pos="0.2 0 0">
    <inertial pos="0 0 0" mass="1.0"
              fullinertia="0.04 0.05 0.06 -0.012 0.008 -0.009"/>
    <joint name="h2j" axis="1 0 0"/>
    <geom type="sphere" size="0.05" contype="0" conaffinity="0"/>
  </body>
</body></worldbody>
<actuator><motor joint="h1j"/><motor joint="h2j"/></actuator>
</mujoco>
"""
    p = tmp_path / "fi.xml"
    p.write_text(xml)
    from mpc_ilqr_tpu.models.robot import load_robot

    m = mujoco.MjModel.from_xml_path(str(p))
    d = mujoco.MjData(m)
    model = load_robot(str(p), dtype=jnp.float64)

    q = np.array([0.37, -0.81])
    d.qpos[:] = q
    d.qvel[:] = 0
    mujoco.mj_forward(m, d)
    M_mj = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M_mj)

    fr = kinematics.forward_kinematics(model, jnp.asarray(q))
    M_jx = np.asarray(engine.mass_matrix(model, fr))
    np.testing.assert_allclose(M_jx, M_mj, rtol=1e-5, atol=1e-10)


def test_world_hinged_body_matches_mujoco(tmp_path):
    """Regression: bodies hinged directly to the WORLD (parent = -1) must get
    an identity parent frame, not a wrapped -1 gather (round-2 fix). Pins FK,
    mass matrix, bias forces, and a dynamics step against MuJoCo on a
    two-link pendulum under gravity."""
    xml = """
<mujoco model="dp"><option timestep="0.01" gravity="0 0 -9.81"/>
<worldbody><body name="l1" pos="0.1 0.2 1.5" quat="0.9238795 0 0.3826834 0">
  <inertial pos="0 0 -0.4" mass="1.2" diaginertia="0.02 0.02 0.004"/>
  <joint name="j1" axis="0 1 0" damping="0.05"/>
  <geom type="capsule" size="0.04 0.4" pos="0 0 -0.4" contype="0" conaffinity="0"/>
  <body name="l2" pos="0 0 -0.8">
    <inertial pos="0 0 -0.3" mass="0.7" diaginertia="0.01 0.01 0.002"/>
    <joint name="j2" axis="1 0 0" damping="0.02"/>
    <geom type="capsule" size="0.03 0.3" pos="0 0 -0.3" contype="0" conaffinity="0"/>
  </body>
</body></worldbody>
<actuator><motor joint="j1"/><motor joint="j2"/></actuator>
</mujoco>
"""
    p = tmp_path / "dp.xml"
    p.write_text(xml)
    from mpc_ilqr_tpu.models.robot import load_robot

    m = mujoco.MjModel.from_xml_path(str(p))
    d = mujoco.MjData(m)
    model = load_robot(str(p), dtype=jnp.float64)

    q = np.array([0.53, -0.91])
    v = np.array([0.4, -0.7])
    d.qpos[:] = q
    d.qvel[:] = v
    mujoco.mj_forward(m, d)

    fr = kinematics.forward_kinematics(model, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(fr.p), d.xpos[1:], atol=1e-12)
    np.testing.assert_allclose(np.asarray(fr.R), d.xmat.reshape(-1, 3, 3)[1:], atol=1e-12)

    M_mj = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M_mj)
    np.testing.assert_allclose(np.asarray(engine.mass_matrix(model, fr)), M_mj, atol=1e-12)

    bias = engine.bias_forces(model, jnp.asarray(q), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-10)

    d.ctrl[:] = [1.5, -0.8]
    x = jnp.concatenate([jnp.asarray(q), jnp.asarray(v)])
    x_next = engine.step(model, x, jnp.asarray(d.ctrl))
    mujoco.mj_step(m, d)
    np.testing.assert_allclose(np.asarray(x_next[: m.nq]), d.qpos, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x_next[m.nq :]), d.qvel, atol=1e-7)
