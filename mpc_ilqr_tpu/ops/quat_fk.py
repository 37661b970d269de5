"""Quaternion-composition FK — the Mosaic-safe formulation (round-2 prep).

The production FK (dynamics/kinematics.py) composes 3×3 rotation matrices;
inside a Pallas TPU kernel batched small matmuls and dynamic gathers do not
lower. This formulation uses ONLY operations Mosaic handles:

- rotations carried as quaternions; all composition/rotation is elementwise
  vector arithmetic on (g, 4)/(g, 3) arrays,
- tree gathers/scatters as one-hot matmuls with constant selection matrices
  (precomputed per level at model-build time).

`quat_frames` is verified against the production FK in tests/test_ops.py;
the round-2 whole-rollout Pallas kernel lifts this function body in-kernel.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ilqr_tpu.dynamics import math as qm
from mpc_ilqr_tpu.dynamics.kinematics import _tree_levels
from mpc_ilqr_tpu.models.robot import JNT_FIXED, JNT_FREE, JNT_HINGE, RobotModel

HP = jax.lax.Precision.HIGHEST


class LevelPlan(NamedTuple):
    """Constant per-level selection/scatter matrices (numpy, model-static)."""

    kind: str  # "free" | "hinge" | "fixed"
    gather_parent: np.ndarray  # (g, B) one-hot: rows select parents
    scatter_child: np.ndarray  # (B, g) one-hot: columns place children
    qsel: np.ndarray  # (g, nq) one-hot hinge angle selector (hinge only)
    body_idx: np.ndarray  # (g,) child body indices


def build_level_plans(model: RobotModel) -> Tuple[LevelPlan, ...]:
    B, nq = model.nbody, model.nq
    unsupported = set(model.body_jnt_type) - {"free", "hinge", "fixed"}
    if unsupported:
        raise NotImplementedError(
            f"pallas FK plan supports free/hinge/fixed joints only (model "
            f"has {sorted(unsupported)})"
        )
    plans = []
    for lv in _tree_levels(model.body_parent, model.body_jnt_type):
        free, hinge, fixed = lv.get("free", ()), lv.get("hinge", ()), lv.get("fixed", ())
        for kind, group in (("free", free), ("hinge", hinge), ("fixed", fixed)):
            if not group:
                continue
            g = len(group)
            gp = np.zeros((g, B))
            sc = np.zeros((B, g))
            qs = np.zeros((g, nq))
            for r, i in enumerate(group):
                p = model.body_parent[i]
                if p >= 0:
                    gp[r, p] = 1.0
                sc[i, r] = 1.0
                if kind == "hinge":
                    qs[r, model.body_qpos_adr[i]] = 1.0
                elif kind == "free":
                    # free root: gather its own qpos block handled separately
                    pass
            plans.append(LevelPlan(kind, gp, sc, qs, np.array(group)))
    return tuple(plans)


def quat_frames(model: RobotModel, plans: Tuple[LevelPlan, ...], q: jnp.ndarray):
    """World body quaternions (B,4) and positions (B,3) — one-hot matmul
    gathers, quaternion-only composition. Equivalent to
    dynamics.kinematics.forward_kinematics's (R, p) with R = quat_to_mat(Q).
    """
    B = model.nbody
    dt = q.dtype
    # Every body row is written exactly once by its level's scatter-add.
    Q = jnp.zeros((B, 4), dt)
    P = jnp.zeros((B, 3), dt)

    for plan in plans:
        if plan.kind == "free":
            # single free root: its world pose is its qpos block
            i = int(plan.body_idx[0])
            a = model.body_qpos_adr[i]
            Q = Q.at[i].set(qm.quat_normalize(q[a + 3 : a + 7]))
            P = P.at[i].set(q[a : a + 3])
            continue
        gp = jnp.asarray(plan.gather_parent, dt)
        sc = jnp.asarray(plan.scatter_child, dt)
        cs = sc.T  # (g, B) child gather = scatter transpose
        Qp = jnp.matmul(gp, Q, precision=HP)  # (g,4) parent quats
        Pp = jnp.matmul(gp, P, precision=HP)  # (g,3)
        # One-hot gathers of the children's model rows (Mosaic-safe: no
        # traced-array fancy indexing).
        Qb = jnp.matmul(cs, model.body_quat.astype(dt), precision=HP)
        Pb = jnp.matmul(cs, model.body_pos.astype(dt), precision=HP)
        Pi = Pp + qm.quat_rotate(Qp, Pb)
        Qi = qm.quat_mul(Qp, Qb)
        if plan.kind == "hinge":
            th = jnp.matmul(jnp.asarray(plan.qsel, dt), q, precision=HP)  # (g,)
            ax = jnp.matmul(cs, model.jnt_axis.astype(dt), precision=HP)
            jp = jnp.matmul(cs, model.jnt_pos.astype(dt), precision=HP)
            Qj = qm.quat_axis_angle(ax, th)
            Pi = Pi + qm.quat_rotate(Qi, jp - qm.quat_rotate(Qj, jp))
            Qi = qm.quat_mul(Qi, Qj)
        Q = Q + jnp.matmul(sc, Qi, precision=HP)
        P = P + jnp.matmul(sc, Pi, precision=HP)
    return Q, P
