"""CSV logging with headers identical to the reference (mpc.cpp:181-343).

- step log: time_index,time_sec,solve_cost,solve_time_ms,x_*,u_*,x_ref_*,u_ref_*
- q_optimal.csv: step,time_sec,q_0..q_{nq-1}   (consumed by simulate/plotter)
- u_optimal.csv: step,time_sec,u_0..u_{nu-1}

The step log rides the native async telemetry writer (io/native.py) so
logging never blocks the 50 Hz control loop — the reference writes its CSV
synchronously on the control thread (mpc.cpp:218-260).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from mpc_ilqr_tpu.io.native import AsyncTelemetry


class StepLogger:
    """MPC::enableCSVLogging / logCurrentStep twin (async, non-blocking)."""

    def __init__(self, path: str, nx: int, nu: int):
        cols = ["time_index", "time_sec", "solve_cost", "solve_time_ms"]
        cols += [f"x_{i}" for i in range(nx)]
        cols += [f"u_{i}" for i in range(nu)]
        cols += [f"x_ref_{i}" for i in range(nx)]
        cols += [f"u_ref_{i}" for i in range(nu)]
        self._telem = AsyncTelemetry(path, ",".join(cols))

    def log(self, t_idx: int, dt: float, cost: float, solve_ms: float, x, u, x_ref, u_ref):
        row = np.concatenate([
            np.array([t_idx, t_idx * dt, cost, solve_ms], dtype=np.float64),
            np.asarray(x, dtype=np.float64).ravel(),
            np.asarray(u, dtype=np.float64).ravel(),
            np.asarray(x_ref, dtype=np.float64).ravel(),
            np.asarray(u_ref, dtype=np.float64).ravel(),
        ])
        self._telem.log(row)

    def close(self):
        self._telem.close()


class OptimalTrajectoryLogger:
    """MPC::enableOptimalTrajectoryLogging / logAppliedOptimal twin."""

    def __init__(self, base_path: str, nq: int, nu: int):
        os.makedirs(base_path, exist_ok=True)
        self.qf = open(os.path.join(base_path, "q_optimal.csv"), "w")
        self.uf = open(os.path.join(base_path, "u_optimal.csv"), "w")
        self.qf.write("step,time_sec," + ",".join(f"q_{i}" for i in range(nq)) + "\n")
        self.uf.write("step,time_sec," + ",".join(f"u_{i}" for i in range(nu)) + "\n")

    def log(self, t_idx: int, dt: float, q_opt, u_opt):
        self.qf.write(
            f"{t_idx},{t_idx * dt}," + ",".join(str(v) for v in np.asarray(q_opt).ravel()) + "\n"
        )
        self.uf.write(
            f"{t_idx},{t_idx * dt}," + ",".join(str(v) for v in np.asarray(u_opt).ravel()) + "\n"
        )

    def close(self):
        for f in (self.qf, self.uf):
            f.flush()
            f.close()
