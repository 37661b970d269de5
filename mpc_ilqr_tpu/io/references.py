"""Reference CSV loading + on-device track precomputation.

Twin of RobotUtils::loadReferences (robot_utils.cpp:281-420): reads headerless
q/v CSVs, then precomputes CoM / CoM-velocity / EE-position / EE-velocity
tracks for every row. The reference does this with one mj_makeData+mj_forward
per row; here it is a single vmapped FK over the whole track on device.

Also loads contact schedules (loadContactSchedule, robot_utils.cpp:445-504):
CSV with a `left_foot,right_foot` header of 0/1 rows; out-of-range timesteps
default to stance (isStance, robot_utils.cpp:494-504).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.costs.references import ReferenceSet
from mpc_ilqr_tpu.dynamics import kinematics as kin
from mpc_ilqr_tpu.models.robot import RobotModel


def load_csv_matrix(path: str) -> np.ndarray:
    """Reference track matrix. CSV parses through the native mmap parser
    (io/native.py, python fallback); .npz twins of the reference data
    (SURVEY C11) load directly via numpy."""
    from mpc_ilqr_tpu.io import native

    if path.endswith(".npz"):
        with np.load(path) as z:
            return np.atleast_2d(np.asarray(z[list(z.files)[0]], dtype=np.float64))
    if path.endswith(".npy"):
        return np.atleast_2d(np.load(path).astype(np.float64))
    return np.atleast_2d(native.read_csv_matrix(path))


def load_contact_schedule(path: str, n_ee: int = 2) -> np.ndarray:
    """Contact CSV with header row -> (T, n_ee) float 0/1."""
    from mpc_ilqr_tpu.io import native

    data = np.atleast_2d(native.read_csv_matrix(path, skip_rows=1))
    if data.shape[1] != n_ee:
        raise ValueError(f"contact schedule has {data.shape[1]} columns, expected {n_ee}")
    return data


def build_reference_set(
    model: RobotModel,
    q_track: np.ndarray,
    v_track: np.ndarray,
    contact: Optional[np.ndarray] = None,
    dtype=None,
) -> ReferenceSet:
    """Assemble a device-resident ReferenceSet from raw tracks."""
    dtype = dtype or model.body_pos.dtype
    T = min(len(q_track), len(v_track))
    q = jnp.asarray(q_track[:T], dtype=dtype)
    v = jnp.asarray(v_track[:T], dtype=dtype)
    if q.shape[1] != model.nq or v.shape[1] != model.nv:
        raise ValueError(
            f"reference dims mismatch: q {q.shape[1]} (want {model.nq}), "
            f"v {v.shape[1]} (want {model.nv})"
        )
    x = jnp.concatenate([q, v], axis=1)
    u = jnp.zeros((T, model.nu), dtype=dtype)  # zero control reference

    com = jax.vmap(lambda qq: kin.com_position(model, qq))(q)
    com_vel = jax.vmap(lambda qq, vv: kin.com_velocity(model, qq, vv))(q, v)
    ee_pos = jax.vmap(lambda qq: kin.ee_positions(model, qq))(q)
    ee_vel = jax.vmap(lambda qq, vv: kin.ee_velocities(model, qq, vv))(q, v)

    n_ee = len(model.ee_body_idx)
    if contact is None:
        stance = jnp.ones((T, n_ee), dtype=dtype)  # default: stance
    else:
        sched = np.ones((T, n_ee))
        L = min(T, len(contact))
        sched[:L] = contact[:L]
        stance = jnp.asarray(sched, dtype=dtype)

    return ReferenceSet(
        x=x, u=u, com=com, com_vel=com_vel, ee_pos=ee_pos, ee_vel=ee_vel, stance=stance
    )


def load_reference_set(
    model: RobotModel,
    q_path: str,
    v_path: str,
    contact_path: Optional[str] = None,
    dtype=None,
) -> ReferenceSet:
    q_track = load_csv_matrix(q_path)
    v_track = load_csv_matrix(v_path)
    contact = load_contact_schedule(contact_path) if contact_path else None
    return build_reference_set(model, q_track, v_track, contact, dtype=dtype)
