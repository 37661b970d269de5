from mpc_ilqr_tpu.ilqr.solver import (  # noqa: F401
    ILQRConfig,
    ILQRSolution,
    backward_pass,
    line_search,
    linearize,
    rollout,
    solve,
)
