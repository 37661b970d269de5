"""Device-mesh sharding for multi-chip fleet MPC.

The reference has no distributed backend (CSV files are its only IPC,
SURVEY §2/§5); scaling here is pure jax.sharding: a 2-D mesh

    ('dp', 'ls')   dp = fleet/data axis, ls = line-search alpha axis

Per-instance solves are embarrassingly parallel along dp. Along ls, the
line-search alphas of each instance can be split across chips: each chip
rolls out its alpha subset, then an all_gather/argmin picks the winner —
collectives ride the ICI. Diagnostics (mean cost, success count) reduce with
psum. The driver validates this path on an N-device virtual CPU mesh via
__graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpc_ilqr_tpu.costs.params import CostParams
from mpc_ilqr_tpu.costs.references import ReferenceSet
from mpc_ilqr_tpu.ilqr.solver import ILQRConfig
from mpc_ilqr_tpu.models.robot import RobotModel
from mpc_ilqr_tpu.parallel import fleet as fleet_mod


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Build a ('dp','ls') mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = n if n % 2 else n // 2
        ls = 1 if n % 2 else 2
    else:
        ls = n // dp
    return Mesh(np.array(devs).reshape(dp, ls), ("dp", "ls"))


def shard_fleet_step(
    mesh: Mesh,
    models: RobotModel,
    cp: CostParams,
    cfg: ILQRConfig,
    refs: ReferenceSet,
):
    """A jitted fleet MPC step sharded over the mesh.

    The fleet axis shards over BOTH mesh axes (dp×ls): every device owns
    fleet_size/(dp·ls) whole instances — per-instance math never crosses
    devices, so XLA inserts collectives only for the psum'd diagnostics.
    Model/state/x leaves shard on their leading (fleet) axis; cp/refs
    replicate.
    """
    fleet_spec = P(("dp", "ls"))

    def spec_like(pytree):
        return jax.tree.map(lambda _: NamedSharding(mesh, fleet_spec), pytree)

    @functools.partial(jax.jit, static_argnums=())
    def step(models_, states_, xs_):
        states2, us, diag = fleet_mod.fleet_step_once(models_, cp, cfg, refs, states_, xs_)
        # Fleet-wide diagnostics: global mean cost and success count (psum-style
        # reductions — XLA lowers these to ICI collectives over the sharded axis).
        mean_cost = jnp.mean(diag.cost)
        n_ok = jnp.sum(diag.solve_ok.astype(jnp.int32))
        return states2, us, diag, mean_cost, n_ok

    return step, spec_like


def place_fleet(mesh: Mesh, pytree, axis: Tuple[str, ...] = ("dp", "ls")):
    """Device-put a fleet-batched pytree with its leading axis sharded."""
    sh = NamedSharding(mesh, P(axis))
    return jax.device_put(pytree, sh)
