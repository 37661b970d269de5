"""Fleet MPC: many H1 instances in lockstep — the DP axis of this framework.

The reference is strictly single-instance, single-core (SURVEY §2 parallelism
inventory: all strategies Absent). The TPU-native scaling story:

- `vmap` over fleet instances (BASELINE config 5: 1024 domain-randomized H1s)
  — one chip, batched onto the VPU/MXU.
- `shard_map` over a device mesh for multi-chip fleets (parallel/sharding.py)
  — per-instance solves are independent (no cross-instance math), so the only
  collectives are diagnostic reductions (psum of costs/success counts) that
  ride the ICI.

Domain randomization perturbs model pytree leaves (masses, gravity, contact
parameters) per instance, replacing the reference's manual scaleRobotMass /
setGravity fault-injection knobs (robot_utils.cpp:782-789, 835-842).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mpc_ilqr_tpu.costs.params import CostParams
from mpc_ilqr_tpu.costs.references import ReferenceSet
from mpc_ilqr_tpu.ilqr import solver as ilqr_solver
from mpc_ilqr_tpu.ilqr.solver import ILQRConfig
from mpc_ilqr_tpu.models.robot import RobotModel
from mpc_ilqr_tpu.mpc import controller


def randomized_models(model: RobotModel, key: jax.Array, n: int,
                      mass_scale_range=(0.8, 1.2),
                      friction_range=(0.7, 1.3),
                      stiffness_jitter=0.2) -> RobotModel:
    """A batched RobotModel: every traced leaf gains a leading fleet axis.

    Masses are scaled per instance (scaleRobotMass analogue), contact
    friction/stiffness jittered. Static structure is shared.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = model.body_pos.dtype
    mass_scale = jax.random.uniform(k1, (n,), dtype, *mass_scale_range)
    friction = jax.random.uniform(k2, (n,), dtype, *friction_range)
    stiff_mult = 1.0 + stiffness_jitter * jax.random.uniform(k3, (n,), dtype, -1.0, 1.0)

    def tile(leaf):
        return jnp.broadcast_to(leaf, (n,) + leaf.shape)

    batched = jax.tree.map(tile, model)
    return batched.replace(
        body_mass=model.body_mass[None, :] * mass_scale[:, None],
        body_inertia=model.body_inertia[None, :, :] * mass_scale[:, None, None],
        contact_friction=model.contact_friction * friction,
        contact_stiffness=model.contact_stiffness * stiff_mult,
    )


def fleet_step_once(models: RobotModel, cp: CostParams, cfg: ILQRConfig,
                    refs: ReferenceSet, states, xs: jnp.ndarray):
    """One MPC step for every fleet instance (batched leading axis on the
    model pytree, states and xs). cp/refs are shared (broadcast).

    The config is auto-downgraded to its vmap-safe form (cascade →
    first_accept, while → scan outer loop): under vmap a cascade's lax.cond
    lowers to select and silently executes both phases per instance."""
    cfg = ilqr_solver.vmap_safe(cfg)

    def one(m, s, x):
        return controller.step_once(m, cp, cfg, refs, s, x)

    return jax.vmap(one)(models, states, xs)


def fleet_step_chunked(models: RobotModel, cp: CostParams, cfg: ILQRConfig,
                       refs: ReferenceSet, states, xs: jnp.ndarray, chunk: int):
    """Fleet step with bounded memory: lax.map over chunks of `chunk`
    instances, vmap inside. The 70-tangent linearization intermediates of a
    fully-vmapped 1024-instance solve exceed HBM (~23 GB); chunking holds
    peak memory at chunk/fleet of that while keeping one dispatch.
    """
    n = xs.shape[0]
    assert n % chunk == 0, f"fleet size {n} not divisible by chunk {chunk}"

    resh = lambda t: jax.tree.map(lambda l: l.reshape((n // chunk, chunk) + l.shape[1:]), t)

    def one_chunk(args):
        m, s, x = args
        return fleet_step_once(m, cp, cfg, refs, s, x)

    out = jax.lax.map(one_chunk, (resh(models), resh(states), resh(xs)))
    return jax.tree.map(lambda l: l.reshape((n,) + l.shape[2:]), out)


def fleet_init(models: RobotModel, cfg: ILQRConfig, n: int):
    proto = jax.tree.map(lambda l: l[0], models)
    state = controller.init_state(proto, cfg)
    return jax.tree.map(lambda l: jnp.broadcast_to(l, (n,) + l.shape), state)
