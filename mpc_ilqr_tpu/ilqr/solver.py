"""iLQR solver — TPU-native redesign of the reference optimizer (ilqr.cpp).

Structure of one compiled solve (everything inside one jit, no host sync):

  rollout        lax.scan of the dynamics step          (ilqr.cpp:119-124)
  linearize      vmap(jacfwd(step)) over the horizon — replaces 25×71 serial
                 finite-difference rollouts             (ilqr.cpp:126-131,
                                                         robot_utils.cpp:120-160)
  quadraticize   vmapped AD grad/hessian of the cost    (ilqr.cpp:133-244)
  backward       Riccati recursion as lax.scan with the reference's
                 λ-regularization + PD bump             (ilqr.cpp:250-309)
  line search    ALL alphas rolled out at once via vmap, first-accept
                 selection — the reference tries them serially
                 (ilqr.cpp:311-361); behavior is identical because it also
                 takes the first (largest) improving alpha
  outer loop     lax.while_loop with the reference's adaptive regularization,
                 retry-once, give-up and divergence policy (ilqr.cpp:619-656)

All dense algebra is pinned to Precision.HIGHEST (TPU bf16 matmuls are not
enough for 51-dim Riccati).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mpc_ilqr_tpu.costs.params import CostParams
from mpc_ilqr_tpu.costs.quadratics import CostQuadratics, quadraticize, trajectory_cost
from mpc_ilqr_tpu.costs.references import ReferenceWindow
from mpc_ilqr_tpu.dynamics import engine
from mpc_ilqr_tpu.models.robot import RobotModel

HIGHEST = jax.lax.Precision.HIGHEST
_mm = lambda a, b: jnp.matmul(a, b, precision=HIGHEST)


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    """Static solver configuration (hashable: safe as a jit static arg).

    Defaults mirror ilqr.cpp:16 and ilqr.cpp:320.
    """

    N: int = 25
    max_iterations: int = 10
    tolerance: float = 1e-4
    reg_init: float = 1e-6
    reg_min: float = 1e-6
    reg_max: float = 1e-3
    pd_bump: float = 1e-4
    alphas: Tuple[float, ...] = (1.0, 0.8, 0.6, 0.4, 0.2, 0.1, 0.05, 0.01)
    accept_threshold: float = 1e-6
    divergence_threshold: float = 1e6
    cost_mode: str = "reference"  # "reference" | "full" (see costs/terms.py)
    n_substeps: int = 1  # physics substeps per horizon step (dt/physics_dt)
    line_search: str = "first_accept"  # or "argmin" (best alpha, TPU-free lunch)
    backward: str = "scan"  # "scan" (lax.scan) | "pallas" (ops/riccati.py kernel)
    # "ad" (jacfwd, exact tangents) | "fd" (batched forward differences,
    # robot_utils.cpp:120-160 recipe) | "ad_frozen_mass" (jacfwd with zero
    # tangents through the inertia assembly M(q) — the standard DDP
    # approximation; removes the GB-scale jvp tensor that dominates
    # fleet-scale linearize, see engine.step frozen_mass) | "structured"
    # (engine.step_and_jac: the same chain rule regrouped by the substep's
    # block structure — analytic u-block, bias/viscosity-only v-block
    # tangents, full jvp for the nq q-block only; exact, ~nq/(nx+nu) of
    # jacfwd's tangent traffic) | "structured_frozen_mass" (both).
    linearization: str = "ad"
    # Outer-iteration control flow. "while" exits early on convergence (best
    # for a single latency-bound solve). "scan" runs exactly max_iterations
    # with masked carries — under vmap (fleet) a while_loop runs to the
    # batch max anyway, and the fixed-trip scan drops the predicate/copy
    # overhead of the batched while.
    outer_loop: str = "while"
    fd_eps: float = 1e-5  # FD perturbation (robot_utils.cpp:122 default)
    scan_unroll: int = 1  # unroll factor for the serial rollout scans
    rollout_solver: str = "chol"  # SPD solver for non-differentiated rollouts ("masked" opt-in)
    # "pallas": whole-rollout TPU kernel (ops/rollout_kernel.py) for the
    # nominal/open-loop rollout — requires float32 and a StepPlan passed to
    # solve()/step_once(). "xla": lax.scan chains (default, any dtype).
    # NOTE: the pallas kernel's velocity solve is its own in-kernel masked
    # Cholesky; cfg.rollout_solver only selects the SPD solver for XLA scan
    # chains and is ignored whenever the pallas path is taken.
    rollout_backend: str = "xla"
    # Line-search backend. "pallas" runs one alpha per grid step — and grid
    # steps SERIALIZE on a TPU core, so the 8-wide vmapped XLA scan beats it
    # for the standard 8-alpha search (measured: 15.8 vs 12.2 ms/step fused).
    # "pallas_batched" rides all alphas on the sublane axis of ONE program
    # (ops/quat_step_batch.py): serial chain length N (not A·N) with the
    # state VMEM-resident — the in-kernel batched search VERDICT r2 asked
    # for. "xla": lane-parallel scan chains (default, any dtype).
    ls_backend: str = "xla"
    # Backend for the cascade's phase-1 single-alpha rollout (a serial chain,
    # where the VMEM-resident pallas kernel wins: 0.65 vs 2.9 ms measured).
    # Set "xla" to keep phase-1 numerics identical to the multi-alpha
    # fallback batch (the f32 kernel's rollout differs by ~7e-5, which can
    # flip an accept decision sitting exactly on the threshold).
    cascade_p1_backend: str = "pallas"
    # Attempts of (backward pass + line search) per outer iteration. The
    # reference retries once with lambda*10 after a failed line search
    # (ilqr.cpp:619-644) — attempts=2. Under vmap the attempt while_loop
    # executes the retry for the WHOLE batch whenever any instance fails
    # (near-certain at fleet scale), doubling backward+LS fleet-wide;
    # inner_attempts=1 drops the same-iteration retry — the lambda*10 bump
    # still happens, taking effect on the next outer iteration instead.
    inner_attempts: int = 2
    # Re-linearize every k-th outer iteration (1 = every iteration, the
    # reference semantics, ilqr.cpp:126-131). k>1 reuses stale A/B between
    # iterations quasi-Newton style — safe (the line search only ever
    # accepts true cost decreases) but can slow per-iteration convergence.
    # Honored only with outer_loop="scan", where the fixed trip count lets
    # the loop unroll statically (lax.cond inside a vmapped scan would
    # execute both branches and save nothing).
    linearize_every: int = 1
    # Tangent/perturbation chunking for linearize: split the nx+nu input
    # directions into groups of this size and lax.map over the groups,
    # holding peak linearize memory at chunk/(nx+nu) of the full batch.
    # 0 = all directions at once. The groups are sequential but each stays
    # a (batch, N, chunk)-wide eval — throughput-, not latency-bound. This
    # is what lets a 1024-instance fleet solve run fully vmapped (the
    # full-width tangent tensor is [fleet, N, 70, ...] ~ 29 GB > HBM).
    lin_chunk: int = 0
    # Same cure for the cost quadraticization's x-Hessian (51 jacfwd-of-grad
    # directions; the residual fleet-scale HBM peak after lin_chunk —
    # measured 2 x 7.8 GB at fleet=1024). 0 = plain jax.hessian.
    hess_chunk: int = 0
    # Cost x-Hessian mode. "exact" = jax.hessian (the reference's CasADi
    # exact Hessians, derivatives.cpp). "gn" = Gauss-Newton on the task
    # residual stack (costs/quadratics.py _quadraticize_gn): lx stays exact
    # (same fixed points), lxx ≈ JᵀJ is PSD and needs only the nr≈23
    # residual tangents through FK instead of the nx jacfwd-of-grad sweep.
    quad_mode: str = "exact"


def vmap_safe(cfg: ILQRConfig) -> ILQRConfig:
    """A config safe to vmap (fleet/seed batching) without silent slowdowns.

    Under vmap, lax.cond lowers to a select, so the cascade line search
    executes BOTH phases for every instance — strictly worse than a plain
    batched first_accept (identical selection semantics, one batch instead
    of 1 + (n-1)). Likewise the early-exit outer while_loop runs to the
    batch max anyway; the fixed-trip scan drops its predicate overhead.
    fleet_step_once/fleet_step_chunked apply this automatically.
    """
    repl = {}
    if cfg.line_search == "cascade":
        repl["line_search"] = "first_accept"
    if cfg.outer_loop == "while":
        repl["outer_loop"] = "scan"
    return dataclasses.replace(cfg, **repl) if repl else cfg


class ILQRSolution(NamedTuple):
    xbar: jnp.ndarray  # (N+1, nx)
    ubar: jnp.ndarray  # (N, nu)
    K: jnp.ndarray  # (N, nu, nx)
    kff: jnp.ndarray  # (N, nu)
    cost: jnp.ndarray  # ()
    iterations: jnp.ndarray  # () i32
    reg: jnp.ndarray  # () final lambda
    # () bool — finite cost AND (at least one accepted line-search step OR the
    # solve was already stationary: no alpha could move the cost by more than
    # the tolerance). A solve where every line search fails badly reports
    # False so the MPC fallback engages (mirror of mpc.cpp:82-91).
    success: jnp.ndarray


def rollout(model: RobotModel, cfg: ILQRConfig, x0: jnp.ndarray, us: jnp.ndarray,
            plan=None) -> jnp.ndarray:
    """Open-loop rollout: (N+1, nx) trajectory from x0 under us.

    With rollout_backend="pallas" (and a StepPlan), the whole serial chain
    runs in one TPU kernel launch with the state VMEM-resident (3.3x the
    XLA scan at N=25, measured on v5e)."""
    if cfg.rollout_backend == "pallas" and plan is not None:
        from mpc_ilqr_tpu.ops.rollout_kernel import rollout_pallas

        return rollout_pallas(model, plan, x0, us, cfg.n_substeps).astype(x0.dtype)

    def f(x, u):
        xn = engine.step(model, x, u, cfg.n_substeps, solver=cfg.rollout_solver)
        return xn, xn

    _, xs = jax.lax.scan(f, x0, us, unroll=cfg.scan_unroll)
    return jnp.concatenate([x0[None], xs], axis=0)


def linearize(model: RobotModel, cfg: ILQRConfig, xs: jnp.ndarray, us: jnp.ndarray):
    """A (N, nx, nx), B (N, nx, nu) over the horizon.

    mode "ad" (default): one batched jacfwd — exact tangents through the
    smooth dynamics. mode "fd": the reference's forward-difference recipe
    (robot_utils.cpp:120-160, eps=1e-5) but with all nx+nu perturbed rollouts
    batched via vmap instead of 1,775 serial mj_step calls. Both share one
    interface so the Jacobian quality through contact can be compared
    (SURVEY §7 hard part 2).
    """
    nx = model.nx
    nd = nx + model.nu
    frozen = cfg.linearization in ("ad_frozen_mass", "structured_frozen_mass")

    if cfg.linearization.startswith("structured"):
        # Block-structured exact Jacobians (engine.step_and_jac): analytic
        # u-block, bias/viscosity-only v-block tangents, full jvp for the
        # nq q-block only — ~nq/(nx+nu) of jacfwd's tangent HBM traffic.
        # cfg.lin_chunk chunks the q-block directions.
        def AB_structured(x, u):
            _, A, B = engine.step_and_jac(
                model, x, u, cfg.n_substeps, frozen_mass=frozen,
                q_chunk=cfg.lin_chunk,
            )
            return A, B

        return jax.vmap(AB_structured)(xs[:-1], us)

    def f(xu):
        return engine.step(model, xu[:nx], xu[nx:], cfg.n_substeps, frozen_mass=frozen)

    # Direction chunking (cfg.lin_chunk): both modes evaluate nd=nx+nu input
    # directions per knot — fd as perturbed primals, ad as jvp tangents. At
    # fleet scale the full-width batch is the HBM peak ([fleet, N, 70, ...]);
    # lax.map over direction groups caps it at lin_chunk/nd of that while
    # each group stays a huge parallel eval.
    c = cfg.lin_chunk if (cfg.lin_chunk and cfg.lin_chunk < nd) else nd
    pad = (-nd) % c
    eye = jnp.eye(nd, dtype=xs.dtype)
    if pad:
        eye = jnp.concatenate([eye, jnp.zeros((pad, nd), xs.dtype)], axis=0)
    eye_g = eye.reshape(-1, c, nd)  # (g, c, nd)

    if cfg.linearization == "fd":
        eps = jnp.asarray(cfg.fd_eps, xs.dtype)

        def AB(x, u):
            xu = jnp.concatenate([x, u])
            base = f(xu)
            cols = lambda E: jax.vmap(lambda e: f(xu + eps * e))(E) - base[None, :]
            pert = (cols(eye_g[0]) if eye_g.shape[0] == 1
                    else jax.lax.map(cols, eye_g).reshape(-1, nx)[:nd])
            J = (pert / eps).T
            return J[:, :nx], J[:, nx:]

    else:

        def AB(x, u):
            # jvp tangents over the concatenated (x,u) — one batched tangent
            # group per lax.map trip (the reference does 70 serial FD
            # rollouts, robot_utils.cpp:137-156).
            xu = jnp.concatenate([x, u])
            cols = lambda E: jax.vmap(lambda e: jax.jvp(f, (xu,), (e,))[1])(E)
            pert = (cols(eye_g[0]) if eye_g.shape[0] == 1
                    else jax.lax.map(cols, eye_g).reshape(-1, nx)[:nd])
            J = pert.T
            return J[:, :nx], J[:, nx:]

    return jax.vmap(AB)(xs[:-1], us)


def backward_pass(
    A: jnp.ndarray,
    B: jnp.ndarray,
    quad: CostQuadratics,
    reg: jnp.ndarray,
    pd_bump: float,
):
    """Riccati recursion (ilqr.cpp:250-309) as a reverse lax.scan.

    Returns K (N, nu, nx), kff (N, nu).
    """
    nu = B.shape[-1]
    I_u = jnp.eye(nu, dtype=B.dtype)

    def step(carry, inp):
        Vx, Vxx = carry
        A_t, B_t, lx_t, lu_t, lxx_t, luu_t = inp
        At, Bt = A_t.T, B_t.T
        Qx = lx_t + _mm(At, Vx)
        Qu = lu_t + _mm(Bt, Vx)
        AtV = _mm(At, Vxx)
        BtV = _mm(Bt, Vxx)
        Qxx = lxx_t + _mm(AtV, A_t)
        Qxu = _mm(AtV, B_t)  # lxu ≡ 0 (separable costs)
        Quu = luu_t + _mm(BtV, B_t) + reg * I_u

        # PD check with bump (ilqr.cpp:278-281): a failed Cholesky yields NaNs.
        L = jnp.linalg.cholesky(Quu)
        bad = ~jnp.isfinite(L).all()
        Quu = Quu + jnp.where(bad, pd_bump, 0.0) * I_u
        L = jnp.linalg.cholesky(Quu)

        K_t = -jax.scipy.linalg.cho_solve((L, True), Qxu.T)
        k_t = -jax.scipy.linalg.cho_solve((L, True), Qu)

        # Value update (ilqr.cpp:293-307)
        KT = K_t.T
        Vx_n = Qx + _mm(KT, _mm(Quu, k_t)) + _mm(KT, Qu) + _mm(Qxu, k_t)
        Vxx_n = Qxx + _mm(KT, _mm(Quu, K_t)) + _mm(KT, Qxu.T) + _mm(Qxu, K_t)
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        return (Vx_n, Vxx_n), (K_t, k_t)

    init = (quad.lx[-1], quad.lxx[-1])
    inputs = (A, B, quad.lx[:-1], quad.lu, quad.lxx[:-1], quad.luu)
    _, (K, kff) = jax.lax.scan(step, init, inputs, reverse=True)
    return K, kff


def line_search(
    model: RobotModel,
    cp: CostParams,
    cfg: ILQRConfig,
    win: ReferenceWindow,
    x0: jnp.ndarray,
    xbar: jnp.ndarray,
    ubar: jnp.ndarray,
    K: jnp.ndarray,
    kff: jnp.ndarray,
    baseline_cost: jnp.ndarray,
    plan=None,
):
    """All alphas rolled out in one batched closed-loop scan (ilqr.cpp:311-361).

    Returns (accepted, xs, us, cost, best_cost) where (xs, us, cost) belong to
    the selected alpha — the largest improving one in first_accept mode
    (reference semantics), or the argmin — and best_cost is the minimum cost
    over all alphas (inf-masked), used by solve() to distinguish "stationary:
    nothing can improve" from "broken: everything got worse".
    """
    alphas = jnp.asarray(cfg.alphas, dtype=x0.dtype)

    def roll_batch(alphas_b, backend=None):
        """Closed-loop rollouts + costs for a batch of alphas."""
        backend = cfg.ls_backend if backend is None else backend
        if backend == "pallas_batched" and plan is not None:
            from mpc_ilqr_tpu.ops.rollout_kernel import (
                linesearch_rollout_pallas_batched,
            )

            xs_b, us_b = linesearch_rollout_pallas_batched(
                model, plan, x0, xbar, ubar, K, kff, alphas_b, cfg.n_substeps
            )
            xs_b = xs_b.astype(x0.dtype)
            us_b = us_b.astype(x0.dtype)
        elif backend == "pallas" and plan is not None:
            from mpc_ilqr_tpu.ops.rollout_kernel import linesearch_rollout_pallas

            xs_b, us_b = linesearch_rollout_pallas(
                model, plan, x0, xbar, ubar, K, kff, alphas_b, cfg.n_substeps
            )
            xs_b = xs_b.astype(x0.dtype)
            us_b = us_b.astype(x0.dtype)
        else:

            def roll_one(alpha):
                def f(x, inp):
                    xb, ub, K_t, k_t = inp
                    u = ub + alpha * k_t + _mm(K_t, x - xb)
                    xn = engine.step(model, x, u, cfg.n_substeps, solver=cfg.rollout_solver)
                    return xn, (xn, u)

                _, (xs_tail, us_) = jax.lax.scan(
                    f, x0, (xbar[:-1], ubar, K, kff), unroll=cfg.scan_unroll
                )
                return jnp.concatenate([x0[None], xs_tail], axis=0), us_

            xs_b, us_b = jax.vmap(roll_one)(alphas_b)
        costs_b = jax.vmap(
            lambda xs_, us_: trajectory_cost(model, cp, win, xs_, us_, mode=cfg.cost_mode)
        )(xs_b, us_b)
        return xs_b, us_b, costs_b

    if cfg.line_search == "cascade" and len(cfg.alphas) > 1:
        # Two-phase first-accept: alpha=1 alone first (the warm-started MPC
        # accepts it almost every step — one cheap rollout instead of the
        # full batch), falling back to the remaining alphas only on reject.
        # Semantics identical to first_accept (alpha ordering preserved).
        # The pallas single-alpha kernel makes phase 1 ~0.65 ms vs the 2.9 ms
        # 8-wide chain (measured, v5e).
        # Phase 1 is a single serial chain: the VMEM-resident pallas kernel
        # wins there; the multi-alpha fallback stays on the lane-parallel
        # XLA batch (a pallas GRID would serialize the alphas). The backend
        # split is an explicit contract (cfg.cascade_p1_backend), not an
        # ls_backend override.
        p1_backend = (
            "pallas" if plan is not None and cfg.cascade_p1_backend == "pallas"
            else "xla"
        )
        xs1, us1, cost1 = roll_batch(alphas[:1], backend=p1_backend)
        c1 = jnp.where(jnp.isfinite(cost1[0]), cost1[0], jnp.inf)
        ok1 = c1 < baseline_cost - cfg.accept_threshold

        def take_first(_):
            return ok1, xs1[0], us1[0], c1, c1

        def fallback(_):
            # Multi-alpha fallback: lane-parallel XLA batch, or the batched
            # one-program kernel when selected (a pallas GRID would serialize).
            fb = "pallas_batched" if cfg.ls_backend == "pallas_batched" else "xla"
            xs_r, us_r, costs_r = roll_batch(alphas[1:], backend=fb)
            costs_r = jnp.where(jnp.isfinite(costs_r), costs_r, jnp.inf)
            improves = costs_r < baseline_cost - cfg.accept_threshold
            acc = improves.any()
            idx = jnp.argmax(improves)
            return (
                acc,
                jnp.take(xs_r, idx, axis=0),
                jnp.take(us_r, idx, axis=0),
                jnp.take(costs_r, idx, axis=0),
                jnp.minimum(c1, jnp.min(costs_r)),
            )

        return jax.lax.cond(ok1, take_first, fallback, None)

    xs_all, us_all, costs = roll_batch(alphas)
    # NaN-poisoned rollouts must never be selected.
    costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
    improves = costs < baseline_cost - cfg.accept_threshold
    accepted = improves.any()
    if cfg.line_search != "argmin":
        # first_accept (and a degenerate single-alpha cascade): first True —
        # alphas are ordered descending
        idx = jnp.argmax(improves)
    else:  # argmin: take the best improving alpha
        idx = jnp.argmin(costs)
    xs = jnp.take(xs_all, idx, axis=0)
    us = jnp.take(us_all, idx, axis=0)
    cost = jnp.take(costs, idx, axis=0)
    return accepted, xs, us, cost, jnp.min(costs)


def solve(
    model: RobotModel,
    cp: CostParams,
    cfg: ILQRConfig,
    x0: jnp.ndarray,
    win: ReferenceWindow,
    ubar_init: jnp.ndarray,
    xbar_init: jnp.ndarray | None = None,
    reg0: jnp.ndarray | float | None = None,
    ls_fn=None,
    plan=None,
) -> ILQRSolution:
    """Multi-iteration iLQR (iLQR::solve, ilqr.cpp:521-660), one jit graph.

    ls_fn optionally replaces the built-in line search with a drop-in
    implementation of the same contract
        ls_fn(win, x0, xbar, ubar, K, kff, baseline) ->
            (accepted, xs, us, cost, best_cost)
    — e.g. the device-mesh-sharded search from parallel/sharded_solve.py
    (alphas spread over the 'ls' mesh axis, winner chosen via a cross-device
    collective).

    The outer lax.while_loop carries (xbar, ubar, K, kff, cost, reg, iter,
    done); each iteration re-rolls the nominal trajectory, linearizes,
    quadraticizes, and runs an inner ≤2-attempt loop (backward pass + line
    search, bumping λ×10 on failure) replicating the reference's retry
    policy. Convergence: |Δcost| < tol; divergence: cost > 1e6; give-up:
    two failed attempts at iter > 1.
    """
    nx, nu, N = model.nx, model.nu, cfg.N
    dtype = x0.dtype
    if xbar_init is None:
        xbar_init = rollout(model, cfg, x0, ubar_init, plan=plan)
    reg = jnp.asarray(cfg.reg_init if reg0 is None else reg0, dtype=dtype)

    # Initial cost on the (possibly shifted, dynamically inconsistent) warm
    # trajectory — exactly what the reference measures first (ilqr.cpp:540).
    cost0 = trajectory_cost(model, cp, win, xbar_init, ubar_init, mode=cfg.cost_mode)

    # Roll the nominal ONCE up front. Inside the loop the carry's xbar is
    # always consistent with (x0, ubar): an accepted line search stores its
    # own closed-loop trajectory, a rejected one leaves both unchanged — so
    # the reference's per-iteration forwardRolloutNominal (ilqr.cpp:119-124)
    # recomputes what is already in hand. Numerically identical, one serial
    # N-step scan saved per iteration.
    xbar_rolled = rollout(model, cfg, x0, ubar_init, plan=plan)

    class Carry(NamedTuple):
        xbar: jnp.ndarray
        ubar: jnp.ndarray
        K: jnp.ndarray
        kff: jnp.ndarray
        cost: jnp.ndarray
        reg: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray
        ever_accepted: jnp.ndarray
        stationary: jnp.ndarray
        diverged: jnp.ndarray

    init = Carry(
        xbar=xbar_rolled,
        ubar=ubar_init,
        K=jnp.zeros((N, nu, nx), dtype),
        kff=jnp.zeros((N, nu), dtype),
        cost=cost0,
        reg=reg,
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        ever_accepted=jnp.zeros((), bool),
        stationary=jnp.zeros((), bool),
        diverged=jnp.zeros((), bool),
    )

    def cond(c: Carry):
        return (~c.done) & (c.it < cfg.max_iterations)

    def body(c: Carry, AB=None):
        xbar = c.xbar  # consistent nominal (see xbar_rolled note above)
        A, B = linearize(model, cfg, xbar, c.ubar) if AB is None else AB
        quad = quadraticize(model, cp, win, xbar, c.ubar,
                            hess_chunk=cfg.hess_chunk, hess_mode=cfg.quad_mode)
        baseline = trajectory_cost(model, cp, win, xbar, c.ubar, mode=cfg.cost_mode)

        class Att(NamedTuple):
            attempt: jnp.ndarray
            reg: jnp.ndarray
            ok: jnp.ndarray
            K: jnp.ndarray
            kff: jnp.ndarray
            xs: jnp.ndarray
            us: jnp.ndarray
            cost: jnp.ndarray
            best: jnp.ndarray

        def att_cond(a: Att):
            return (~a.ok) & (a.attempt < 2)

        def att_body(a: Att) -> Att:
            if cfg.backward == "pallas":
                from mpc_ilqr_tpu.ops.riccati import backward_pass_pallas

                interp = jax.default_backend() not in ("tpu", "axon")
                K, kff = backward_pass_pallas(
                    A, B, quad.lx, quad.lu, quad.lxx, quad.luu, a.reg,
                    cfg.pd_bump, interpret=interp,
                )
            elif cfg.backward == "assoc":
                from mpc_ilqr_tpu.ops.assoc_riccati import backward_pass_assoc

                K, kff = backward_pass_assoc(A, B, quad, a.reg, cfg.pd_bump)
            else:
                K, kff = backward_pass(A, B, quad, a.reg, cfg.pd_bump)
            if ls_fn is not None:
                ok, xs, us, cost, best = ls_fn(
                    win, x0, xbar, c.ubar, K, kff, baseline
                )
            else:
                ok, xs, us, cost, best = line_search(
                    model, cp, cfg, win, x0, xbar, c.ubar, K, kff, baseline,
                    plan=plan,
                )
            reg_next = jnp.where(ok, a.reg, jnp.minimum(a.reg * 10.0, cfg.reg_max))
            return Att(a.attempt + 1, reg_next, ok, K, kff, xs, us, cost, best)

        a0 = Att(
            attempt=jnp.zeros((), jnp.int32),
            reg=c.reg,
            ok=jnp.zeros((), bool),
            K=c.K,
            kff=c.kff,
            xs=xbar,
            us=c.ubar,
            cost=baseline,
            best=jnp.asarray(jnp.inf, dtype),
        )
        if cfg.inner_attempts == 1:
            a = att_body(a0)  # no same-iteration retry (see inner_attempts)
        else:
            a = jax.lax.while_loop(att_cond, att_body, a0)

        # Stationary: no alpha improved, but none moved the cost beyond the
        # convergence tolerance either — the warm start is already optimal.
        # (When ~a.ok every cost is >= baseline − accept_threshold, so this
        # is a tight band around baseline; a solve where everything blows up
        # past baseline + tol stays non-stationary and reports failure.)
        stationary_now = (~a.ok) & (a.best <= baseline + cfg.tolerance)

        new_cost = jnp.where(a.ok, a.cost, c.cost)
        new_ubar = jnp.where(a.ok, a.us, c.ubar)
        new_xbar = jnp.where(a.ok, a.xs, xbar)
        new_reg = jnp.where(a.ok, jnp.maximum(a.reg / 2.0, cfg.reg_min), a.reg)

        give_up = (~a.ok) & (c.it > 1)
        delta = jnp.abs(new_cost - c.cost)
        converged = a.ok & (delta < cfg.tolerance)
        diverged = a.ok & (new_cost > cfg.divergence_threshold)
        return (A, B), Carry(
            xbar=new_xbar,
            ubar=new_ubar,
            K=a.K,
            kff=a.kff,
            cost=new_cost,
            reg=new_reg,
            it=c.it + 1,
            done=give_up | converged | diverged,
            ever_accepted=c.ever_accepted | a.ok,
            stationary=c.stationary | stationary_now,
            diverged=c.diverged | diverged,
        )

    def masked(c: Carry, c2: Carry) -> Carry:
        # Converged/diverged lanes freeze their carry (masked update).
        return jax.tree.map(lambda n, o: jnp.where(c.done, o, n), c2, c)

    if cfg.outer_loop == "scan" and cfg.linearize_every > 1:
        # Static Python unroll: linearize only on every k-th trip, reusing
        # the (stale) A/B in between — see ILQRConfig.linearize_every.
        c, AB = init, None
        for it in range(cfg.max_iterations):
            use = None if it % cfg.linearize_every == 0 else AB
            AB, c2 = body(c, use)
            c = masked(c, c2)
    elif cfg.outer_loop == "scan":

        def body_scan(c: Carry, _):
            _, c2 = body(c)
            return masked(c, c2), None

        c, _ = jax.lax.scan(body_scan, init, None, length=cfg.max_iterations)
    else:
        c = jax.lax.while_loop(cond, lambda c: body(c)[1], init)
    return ILQRSolution(
        xbar=c.xbar,
        ubar=c.ubar,
        K=c.K,
        kff=c.kff,
        cost=c.cost,
        iterations=c.it,
        reg=c.reg,
        success=(c.ever_accepted | c.stationary)
        & (~c.diverged)
        & jnp.isfinite(c.cost),
    )
