"""config.yaml-compatible configuration (reference src/common/config.cpp).

Key names and semantics are preserved so the reference's config.yaml works
unchanged. Extra engine knobs (cost_mode, line_search, contact parameters)
live under an optional `engine:` section with reference-faithful defaults.
Missing required keys raise KeyError, mirroring the reference's hard exit
(config.cpp:59-62).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import yaml


@dataclasses.dataclass
class MpcSection:
    horizon: int
    dt: float
    physics_dt: float
    gravity: List[float]
    sim_steps: int
    contact_impratio: float
    cost_weights: dict
    constraints: dict


@dataclasses.dataclass
class AppConfig:
    model_path: str
    urdf_path: str
    ee_feet: dict
    q_ref_path: str
    v_ref_path: str
    contact_schedule_path: str
    mpc: MpcSection
    logs_dir: str
    results_dir: str
    verbose: bool
    save_trajectories: bool
    results_path: str
    engine: dict  # TPU-engine extras (defaults applied)
    root: str  # directory paths are resolved against

    def resolve(self, p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(self.root, p)


_ENGINE_DEFAULTS = dict(
    cost_mode="reference",
    line_search="first_accept",
    contact_stiffness=3.0e4,
    contact_damping=3.0e3,
    contact_friction=1.0,
    max_iterations=10,
    tolerance=1e-4,
    dtype="float32",
    backward="scan",  # "scan" | "pallas" (ops/riccati.py one-launch kernel)
    linearization="ad",  # "ad" | "fd" | "ad_frozen_mass" | "structured[_frozen_mass]"
    quad_mode="exact",  # "exact" (jax.hessian) | "gn" (Gauss-Newton residual stack)
    scan_unroll=1,
    quat_tangent=False,  # tangent-space base-orientation error (parity: raw)
)


def load_config(path: str = "config.yaml") -> AppConfig:
    with open(path) as f:
        y = yaml.safe_load(f)

    mpc = y["mpc"]
    engine = dict(_ENGINE_DEFAULTS)
    engine.update(y.get("engine", {}) or {})
    return AppConfig(
        model_path=y["robot"]["model_path"],
        urdf_path=y["robot"].get("urdf_path", ""),
        ee_feet=y["robot"].get(
            "ee_feet",
            {"right_feet_ee": "right_ankle_link", "left_feet_ee": "left_ankle_link"},
        ),
        q_ref_path=y["reference_trajectory"]["q_ref"],
        v_ref_path=y["reference_trajectory"]["v_ref"],
        contact_schedule_path=y["reference_trajectory"]["contact_schedule"],
        mpc=MpcSection(
            horizon=int(mpc["horizon"]),
            dt=float(mpc["dt"]),
            physics_dt=float(mpc["physics_dt"]),
            gravity=[float(g) for g in mpc["gravity"]],
            sim_steps=int(mpc["sim_steps"]),
            contact_impratio=float(mpc.get("contact_impratio", 100.0)),
            cost_weights=mpc["cost_weights"],
            constraints=mpc["constraints"],
        ),
        logs_dir=y.get("paths", {}).get("logs_dir", "logs"),
        results_dir=y.get("paths", {}).get("results_dir", "results"),
        verbose=bool(y["logging"]["verbose"]),
        save_trajectories=bool(y["logging"]["save_trajectories"]),
        results_path=y["logging"].get("results_path", "results"),
        engine=engine,
        root=os.path.dirname(os.path.abspath(path)),
    )
