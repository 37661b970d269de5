#!/usr/bin/env python3
"""Trajectory playback (reference simulate.py, C8).

Plays results/q_optimal.csv in the MuJoCo passive viewer at 50 FPS with 5
prepended standing frames and gravity zeroed, exactly like the reference
(simulate.py:54-113). Headless environments get a --headless validation mode
that replays the frames through the framework's own FK instead.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def load_q_optimal(path):
    import csv

    with open(path) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    q_cols = [i for i, c in enumerate(header) if c.startswith("q_")]
    return np.array([[float(r[i]) for i in q_cols] for r in rows[1:]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--headless", action="store_true",
                    help="validate frames via framework FK instead of the viewer")
    args = ap.parse_args()

    try:
        cfg = yaml.safe_load(open(args.config))
        model_path = cfg["robot"]["model_path"]
        results_dir = cfg["paths"]["results_dir"]
    except (FileNotFoundError, KeyError):
        model_path = "robots/h1_description/mjcf/scene.xml"
        results_dir = "results"
    q_path = os.path.join(results_dir, "q_optimal.csv")
    if not os.path.exists(q_path):
        print(f"Error: {q_path} not found. Run the MPC first (python run_mpc.py).")
        return

    q_traj = load_q_optimal(q_path)
    standing = np.zeros((5, q_traj.shape[1]))
    standing[:, 2] = 1.0432
    standing[:, 3] = 1.0
    frames = np.vstack([standing, q_traj])
    print(f"Loaded {len(q_traj)} frames (+5 standing) from {q_path}")

    if args.headless:
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from mpc_ilqr_tpu.dynamics.kinematics import forward_kinematics
        from mpc_ilqr_tpu.models.robot import load_h1

        model = load_h1()
        fk = jax.jit(lambda q: forward_kinematics(model, q).p)
        for i, q in enumerate(frames):
            p = fk(jnp.asarray(q, dtype=model.body_pos.dtype))
            assert bool(jnp.isfinite(p).all()), f"non-finite FK at frame {i}"
        print(f"Headless validation OK: {len(frames)} frames, all body poses finite.")
        return

    import mujoco
    import mujoco.viewer

    m = mujoco.MjModel.from_xml_path(model_path)
    d = mujoco.MjData(m)
    m.opt.gravity[:] = 0.0
    print(f"Model: nq={m.nq} | trajectory nq={frames.shape[1]}")
    if frames.shape[1] != m.nq:
        print("Dimension mismatch, aborting.")
        return

    fps = 50
    frame = 0
    with mujoco.viewer.launch_passive(m, d) as viewer:
        while viewer.is_running():
            d.qpos[:] = frames[frame]
            mujoco.mj_forward(m, d)
            viewer.sync()
            frame = (frame + 1) % len(frames)
            time.sleep(1.0 / fps)


if __name__ == "__main__":
    main()
