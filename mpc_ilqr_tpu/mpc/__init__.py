from mpc_ilqr_tpu.mpc.controller import (  # noqa: F401
    MPCDiagnostics,
    MPCState,
    init_state,
    reset,
    run_closed_loop,
    step_once,
    tvlqr_control,
)
