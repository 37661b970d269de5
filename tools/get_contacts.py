#!/usr/bin/env python3
"""Contact-schedule generator (reference get_contacts.py, C7).

Replays a reference q trajectory through the framework's OWN kinematics and
marks a foot in stance when any of its sole contact points is within the
contact threshold of the ground — the same dist < 0.001 criterion the
reference applies to MuJoCo contacts (get_contacts.py:121-147), but computed
with the engine's foot contact points, so the schedule is consistent with
the dynamics the MPC actually uses.

Usage:
    python tools/get_contacts.py
    python tools/get_contacts.py --input data/q_ref2_pin.csv \
        --output data/contact_walking.csv --pinocchio-convention
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def convert_pinocchio_to_mujoco(q: np.ndarray) -> np.ndarray:
    """Pinocchio [x,y,z,qx,qy,qz,qw,...] -> MuJoCo [x,y,z,qw,qx,qy,qz,...]."""
    out = q.copy()
    if q.shape[-1] >= 7:
        out[..., 3] = q[..., 6]
        out[..., 4] = q[..., 3]
        out[..., 5] = q[..., 4]
        out[..., 6] = q[..., 5]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", "-i", default="data/q_ref2_pin.csv")
    ap.add_argument("--output", "-o", default="data/contact_walking.csv")
    ap.add_argument("--pinocchio-convention", "--pinocchio", "-p", action="store_true",
                    default=True)
    ap.add_argument("--mujoco-convention", dest="pinocchio_convention", action="store_false")
    ap.add_argument("--threshold", type=float, default=0.001)
    ap.add_argument("--save-mj-trajectory", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mpc_ilqr_tpu.dynamics.kinematics import forward_kinematics
    from mpc_ilqr_tpu.models.robot import load_h1

    model = load_h1()
    q_ref = np.loadtxt(args.input, delimiter=",")
    print(f"Loaded {len(q_ref)} timesteps from {args.input} (shape {q_ref.shape})")

    if args.pinocchio_convention:
        q_ref = convert_pinocchio_to_mujoco(q_ref)
        print("Converted quaternion convention Pinocchio -> MuJoCo")

    # Sole point heights per foot via batched FK.
    cp_body = np.asarray(model.cp_body_idx)
    n_ee = model.n_ee

    def foot_min_heights(q):
        fr = forward_kinematics(model, q)
        pw = fr.p[jnp.asarray(cp_body)] + jnp.einsum(
            "cij,cj->ci", fr.R[jnp.asarray(cp_body)], model.cp_pos
        )
        heights = []
        for k, b in enumerate(model.ee_body_idx):
            mask = cp_body == b
            heights.append(jnp.min(jnp.where(jnp.asarray(mask), pw[:, 2], jnp.inf)))
        return jnp.stack(heights)

    heights = jax.vmap(foot_min_heights)(jnp.asarray(q_ref, dtype=model.body_pos.dtype))
    schedule = (np.asarray(heights) < args.threshold).astype(int)

    header = "left_foot,right_foot" if n_ee == 2 else ",".join(
        f"ee_{i}" for i in range(n_ee)
    )
    np.savetxt(args.output, schedule, fmt="%d", delimiter=",", header=header, comments="")
    if args.save_mj_trajectory and args.pinocchio_convention:
        np.savetxt("data/q_ref2_mj.csv", q_ref, delimiter=",", fmt="%.18g")

    T = len(schedule)
    print(f"Contact schedule saved to {args.output} (shape {schedule.shape})")
    print(f"  Left foot in contact:  {schedule[:,0].sum()}/{T}")
    print(f"  Right foot in contact: {schedule[:,1].sum()}/{T}")
    print(f"  Both feet:             {np.all(schedule==1,axis=1).sum()}/{T}")
    print(f"  Flight:                {np.all(schedule==0,axis=1).sum()}/{T}")


if __name__ == "__main__":
    main()
