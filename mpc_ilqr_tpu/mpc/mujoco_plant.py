"""MuJoCo-in-the-loop validation: our controller, the reference's physics.

The reference's plant IS MuJoCo (humanoid_mpc.cpp drives mj_step); the
riskiest gap in this rebuild is the contact model (SURVEY §7 hard part 1).
This module closes the loop across that gap: the TPU controller plans with
the differentiable engine while the *plant* is a real MuJoCo simulation with
the reference's solver settings (elliptic cone, Newton, 500 iters, tol 1e-8,
impratio — robot_utils.cpp:58-63, 588-592). If the H1 stays standing here,
the compliant internal model is close enough to control the real thing.

mujoco is an optional dependency (test oracle / tooling only); import of
this module is gated accordingly.
"""
from __future__ import annotations

import numpy as np

try:
    import mujoco
except ImportError:  # pragma: no cover
    mujoco = None

from mpc_ilqr_tpu.models.robot import RobotModel


class MuJoCoPlant:
    """Minimal plant wrapper: setState/setControl/step like RobotUtils."""

    def __init__(self, xml_path: str, gravity, timestep: float, impratio: float = 100.0):
        if mujoco is None:
            raise ImportError("mujoco is required for the MuJoCo-in-the-loop plant")
        self.m = mujoco.MjModel.from_xml_path(xml_path)
        self.m.opt.gravity[:] = gravity
        self.m.opt.timestep = timestep
        self.m.opt.impratio = impratio
        # Reference solver tuning (robot_utils.cpp:588-592)
        self.m.opt.cone = mujoco.mjtCone.mjCONE_ELLIPTIC
        self.m.opt.jacobian = mujoco.mjtJacobian.mjJAC_SPARSE
        self.m.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
        self.m.opt.iterations = 500
        self.m.opt.tolerance = 1e-8
        self.d = mujoco.MjData(self.m)

    def set_state(self, x: np.ndarray):
        self.d.qpos[:] = x[: self.m.nq]
        self.d.qvel[:] = x[self.m.nq :]
        mujoco.mj_forward(self.m, self.d)

    def get_state(self) -> np.ndarray:
        return np.concatenate([np.asarray(self.d.qpos), np.asarray(self.d.qvel)])

    def step(self, u: np.ndarray, n_substeps: int = 1):
        self.d.ctrl[:] = np.asarray(u)
        for _ in range(n_substeps):
            mujoco.mj_step(self.m, self.d)
        return self.get_state()


def run_mujoco_in_the_loop(prob, n_steps: int, x0=None, verbose: bool = False):
    """Closed loop: jitted step_once controller + MuJoCo plant.

    Returns history dict with per-step state/control/cost.
    """
    import jax
    import jax.numpy as jnp

    from mpc_ilqr_tpu.models.robot import standing_state
    from mpc_ilqr_tpu.mpc import controller

    model, cp, cfg, refs, app = prob.model, prob.cp, prob.cfg, prob.refs, prob.app
    plant = MuJoCoPlant(
        app.resolve(app.model_path),
        gravity=app.mpc.gravity,
        timestep=app.mpc.physics_dt,
        impratio=app.mpc.contact_impratio,
    )
    x = np.asarray(standing_state(model) if x0 is None else x0, dtype=np.float64)
    plant.set_state(x)
    substeps = max(1, round(app.mpc.dt / app.mpc.physics_dt))

    # model TRACED (not closed over): every contact-calibration / domain
    # variant of the same robot shares ONE compiled graph (the
    # tools/contact_sweep.py trick), and this loop hits the same cache entry.
    step_once = jax.jit(lambda m, s, xx: controller.step_once(m, cp, cfg, refs, s, xx))
    state = controller.init_state(model, cfg)
    dtype = model.body_pos.dtype

    hist = {"x": [], "u": [], "cost": []}
    for i in range(n_steps):
        xj = jnp.asarray(x, dtype=dtype)
        state, u, diag = jax.block_until_ready(step_once(model, state, xj))
        u_np = np.asarray(u, dtype=np.float64)
        if not np.isfinite(u_np).all():
            u_np = np.zeros_like(u_np)
        x = plant.step(u_np, substeps)
        hist["x"].append(x.copy())
        hist["u"].append(u_np)
        hist["cost"].append(float(diag.cost))
        if verbose:
            print(
                f"[mj-loop] step {i}: cost {float(diag.cost):.4f} "
                f"base z {x[2]:.4f} quat w {x[3]:.4f}"
            )
    return hist
