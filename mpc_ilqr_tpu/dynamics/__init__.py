from mpc_ilqr_tpu.dynamics.engine import (  # noqa: F401
    bias_forces,
    contact_forces,
    gravity_comp,
    mass_matrix,
    step,
)
from mpc_ilqr_tpu.dynamics.kinematics import (  # noqa: F401
    com_position,
    com_velocity,
    ee_positions,
    ee_velocities,
    forward_kinematics,
    task_features,
)
