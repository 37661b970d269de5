"""Checkpoint / resume for the MPC carry.

The reference has no checkpointing — its warm-start store is in-process
memory lost on exit (SURVEY §5: prev_xbar_/prev_ubar_/prev_K_, mpc.cpp:
108-112). Here the whole solve-to-solve state is one pytree (MPCState), so
checkpointing is a flat save/restore; `set_time_index` reproduces the
reference's setTimeIndex repositioning (mpc.hpp:27).

npz keeps this dependency-free; for multi-host fleets the same pytree drops
straight into orbax.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.mpc.controller import MPCState

_FIELDS = ("t_idx", "prev_xbar", "prev_ubar", "prev_K", "has_prev", "reg")


def save_state(path: str, state: MPCState) -> None:
    np.savez(path, **{k: np.asarray(getattr(state, k)) for k in _FIELDS})


def load_state(path: str, dtype=jnp.float32) -> MPCState:
    with np.load(path) as z:
        return MPCState(
            t_idx=jnp.asarray(z["t_idx"], jnp.int32),
            prev_xbar=jnp.asarray(z["prev_xbar"], dtype),
            prev_ubar=jnp.asarray(z["prev_ubar"], dtype),
            prev_K=jnp.asarray(z["prev_K"], dtype),
            has_prev=jnp.asarray(bool(z["has_prev"])),
            reg=jnp.asarray(z["reg"], dtype),
        )


def set_time_index(state: MPCState, t_idx: int) -> MPCState:
    """Reposition in the reference track (MPC::setTimeIndex)."""
    return state.replace(t_idx=jnp.asarray(t_idx, jnp.int32))
