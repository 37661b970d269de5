from mpc_ilqr_tpu.costs.params import CostParams, build_cost_params  # noqa: F401
from mpc_ilqr_tpu.costs.quadratics import (  # noqa: F401
    CostQuadratics,
    quadraticize,
    trajectory_cost,
)
from mpc_ilqr_tpu.costs.references import (  # noqa: F401
    ReferenceSet,
    ReferenceWindow,
    extract_window,
)
