"""mpc_ilqr_tpu — a TPU-native (JAX/XLA/Pallas) humanoid iLQR-MPC framework.

A ground-up re-design of the capabilities of premsuggu/mpc-ilqr-mujoco
(C++ / MuJoCo / Pinocchio / CasADi, single CPU core) as a pure-JAX engine:

- ``models``    MJCF robot loading into a frozen array-of-struct pytree
                (replaces mj_loadXML + the URDF/Pinocchio model twin).
- ``dynamics``  Differentiable rigid-body physics: FK, Jacobians, mass matrix,
                bias forces, smooth compliant contact, semi-implicit Euler step
                (replaces MuJoCo mj_step/mj_forward, robot_utils.cpp).
- ``costs``     The full reference cost library (tracking, CoM, end-effector,
                upright, capture-point balance, soft limits) with AD
                quadraticization (replaces CasADi symbolic derivatives).
- ``ilqr``      iLQR: lax.scan Riccati backward pass, jacfwd linearization,
                vmapped line search (replaces ilqr.cpp + 1775 FD rollouts).
- ``mpc``       Fully-jitted receding-horizon controller (replaces mpc.cpp).
- ``parallel``  Fleet MPC: vmap over instances, shard_map over device meshes.
- ``io``        config.yaml-compatible configuration, CSV references,
                contact schedules, trajectory logging.
- ``ops``       Pallas TPU kernels and small-matrix linear algebra.

State convention matches MuJoCo: x = [qpos(nq); qvel(nv)], base quaternion
stored wxyz, free-joint velocity = [v_world(3), omega_body(3)].
"""

__version__ = "0.1.0"

from mpc_ilqr_tpu.models.robot import RobotModel, load_h1, load_robot  # noqa: F401
