"""Reference trajectory containers and window extraction.

Device-resident equivalents of RobotUtils' reference storage
(x_ref_full_/u_ref_full_/com_ref_full_/..., robot_utils.hpp:120-129) and of
`getReferenceWindow` (robot_utils.cpp:422-443): the window is a clamped
gather, so the MPC loop stays one compiled program with a dynamic t_idx.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class ReferenceSet(struct.PyTreeNode):
    """Full reference tracks of length T (device arrays)."""

    x: jnp.ndarray  # (T, nx)
    u: jnp.ndarray  # (T, nu) — zeros in the reference pipeline
    com: jnp.ndarray  # (T, 3)
    com_vel: jnp.ndarray  # (T, 3)
    ee_pos: jnp.ndarray  # (T, n_ee, 3)
    ee_vel: jnp.ndarray  # (T, n_ee, 3)
    stance: jnp.ndarray  # (T, n_ee) float 0/1 contact schedule

    @property
    def length(self) -> int:
        return self.x.shape[0]


class ReferenceWindow(struct.PyTreeNode):
    """References for one horizon: N+1 states / N controls."""

    x: jnp.ndarray  # (N+1, nx)
    u: jnp.ndarray  # (N, nu)
    com: jnp.ndarray  # (N+1, 3)
    com_vel: jnp.ndarray  # (N+1, 3)
    ee_pos: jnp.ndarray  # (N+1, n_ee, 3)
    stance: jnp.ndarray  # (N+1, n_ee)


def extract_window(refs: ReferenceSet, t0: jnp.ndarray, N: int) -> ReferenceWindow:
    """Clamped-index gather: indices beyond the track repeat the last row
    (robot_utils.cpp:430-442). t0 may be a traced scalar."""
    T = refs.length
    idx = jnp.clip(t0 + jnp.arange(N + 1), 0, T - 1)
    take = lambda a, i: jnp.take(a, i, axis=0)
    return ReferenceWindow(
        x=take(refs.x, idx),
        u=take(refs.u, idx[:N]),
        com=take(refs.com, idx),
        com_vel=take(refs.com_vel, idx),
        ee_pos=take(refs.ee_pos, idx),
        stance=take(refs.stance, idx),
    )
