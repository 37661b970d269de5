"""Pallas whole-rollout kernel: N dynamics steps in ONE kernel launch.

Lifts the Mosaic-safe step (ops/quat_step.py) into a single pl.pallas_call:
the state never leaves VMEM between timesteps, removing the per-scan-
iteration overhead of the XLA rollout (measured to dominate the step cost
at these sizes — ROUNDLOG round 1). Model arrays and the plan's constant
selection matrices stream in as kernel inputs (Pallas forbids captured
array constants); static structure (level kinds, free-joint addresses)
bakes into the trace.

Open-loop variant (plant rollouts / simulation). NOT differentiable — the
solver's linearize path keeps the XLA step with its factor-reusing JVP.

STATUS (round 1): EXPERIMENTAL — numerically verified in interpret mode
(matches the XLA rollout), and the trace passes Mosaic's lowering of dots,
gathers, and the masked solve after the fixes below, but the Mosaic
compiler currently aborts with an internal tiling assert
(layout.h Check failed: offsets_[0] < tiling_[0]) on this kernel's
odd-rowed (25/51-row) slice/concat chains. Round-2 plan: pad all working
shapes to 8-row multiples in-kernel. Lowering classes already resolved:
  - no captured array constants (everything streams in as inputs),
  - 2-D dots only (per-body matmul loops replace 3-D einsums),
  - no value scatters (concatenation updates), no empty slices,
  - constant-free quat_conj / iota-built identity matrices.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_ilqr_tpu.models.robot import RobotModel
from mpc_ilqr_tpu.ops.quat_step import (
    StepPlan,
    build_step_plan,
    plan_arrays,
    plan_with_arrays,
    step_mosaic,
)


def rollout_pallas(model: RobotModel, plan: StepPlan, x0: jnp.ndarray,
                   us: jnp.ndarray, n_substeps: int = 1, interpret: bool = False):
    """Open-loop rollout x_{t+1} = f(x_t, u_t): returns xs (N+1, nx) f32."""
    N = us.shape[0]
    nx = model.nx
    f32 = jnp.float32

    # Every array operand becomes a kernel input: model pytree leaves + the
    # plan's constant matrices. Scalars are lifted to (1,) for VMEM.
    model_leaves, model_def = jax.tree.flatten(model)
    parr_leaves, parr_def = jax.tree.flatten(plan_arrays(plan))
    shapes0 = [jnp.ndim(l) == 0 for l in model_leaves]
    model_in = [jnp.atleast_1d(jnp.asarray(l, f32)) for l in model_leaves]
    plan_in = [jnp.atleast_1d(jnp.asarray(l, f32)) for l in parr_leaves]
    n_model = len(model_in)

    def kernel(*refs):
        x0_ref, us_ref = refs[0], refs[1]
        mrefs = refs[2 : 2 + n_model]
        prefs = refs[2 + n_model : -1]
        out_ref = refs[-1]

        mvals = [r[...] for r in mrefs]
        mvals = [v[0] if was0 else v for v, was0 in zip(mvals, shapes0)]
        kmodel = jax.tree.unflatten(model_def, mvals)
        pvals = [r[...] for r in prefs]
        kplan = plan_with_arrays(plan, jax.tree.unflatten(parr_def, pvals))

        out_ref[0] = x0_ref[0]

        def body(t, x):
            xn = step_mosaic(kmodel, kplan, x, us_ref[t], n_substeps)
            out_ref[t + 1] = xn
            return xn

        jax.lax.fori_loop(0, N, body, x0_ref[0])

    n_in = 2 + n_model + len(plan_in)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N + 1, nx), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x0.astype(f32)[None], us.astype(f32), *model_in, *plan_in)
