"""Associative-scan (parallel) Riccati backward pass — O(log N) depth.

The sequence-parallel answer to the reference's serial horizon recursion
(SURVEY §5 long-context: "an associative-scan Riccati is the optional
sequence-parallel analog"). Three fully parallel phases replace the N-step
serial backward pass:

1. Vxx via jax.lax.associative_scan over value elements (A, C, J) with the
   Riccati/LFT composition (the Woodbury information form:
   Vxx_t = lxx_t + Aᵀ(I + Vxx' C)⁻¹ Vxx' A with C = B (luu+λI)⁻¹ Bᵀ).
2. Vx via a second associative scan of the affine recurrence
   Vx_t = c_t + M_t Vx_{t+1} (coefficients computable once Vxx is known).
3. Gains K, kff via one vmapped Cholesky solve over all timesteps.

Exactly equivalent to the serial recursion in exact arithmetic (the λ
regularization folds into luu; the serial version's data-dependent PD bump
has no parallel analog — if Quu is not PD the vmapped Cholesky adds the
same bump per-timestep). Composition rule verified against function
composition and the serial scan in tests/test_ops.py.

Useful when N is large (the N=100 @ 100 Hz config): depth drops from N
sequential small solves to ~log2(N) rounds of batched (N-wide) 51×51
solves — much better TPU shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpc_ilqr_tpu.costs.quadratics import CostQuadratics

HP = jax.lax.Precision.HIGHEST
_mm = lambda a, b: jnp.matmul(a, b, precision=HP)


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _eye_like(M):
    return jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)


def backward_pass_assoc(A, B, quad: CostQuadratics, reg, pd_bump: float = 1e-4):
    """Drop-in replacement for ilqr.solver.backward_pass (parallel in N).

    A (N,nx,nx), B (N,nx,nu), quad: CostQuadratics, reg scalar.
    Returns (K (N,nu,nx), kff (N,nu)).
    """
    N, nx, _ = A.shape
    nu = B.shape[-1]
    dtype = A.dtype
    I_x = jnp.eye(nx, dtype=dtype)
    I_u = jnp.eye(nu, dtype=dtype)

    luu_reg = quad.luu + reg * I_u  # (N,nu,nu)
    # C_t = B luu_reg^{-1} Bᵀ ;  b_t = -B luu_reg^{-1} lu
    Bt = jnp.swapaxes(B, -1, -2)
    sol = jax.vmap(jnp.linalg.solve)(luu_reg, jnp.concatenate([Bt, quad.lu[..., None]], -1))
    C = _sym(_mm(B, sol[..., :nx]))  # (N,nx,nx)
    b = -_mm(B, sol[..., nx:])[..., 0]  # (N,nx)

    # --- Phase 1: Vxx by associative scan ------------------------------------
    # Elements (A_e, C_e, J_e); terminal element (0, 0, lxx_N) appended.
    A_e = jnp.concatenate([A, jnp.zeros((1, nx, nx), dtype)], 0)
    C_e = jnp.concatenate([C, jnp.zeros((1, nx, nx), dtype)], 0)
    J_e = quad.lxx  # (N+1,nx,nx): lxx_t at the earlier boundary, lxx_N terminal

    def combine(e_a, e_b):
        # With reverse=True, associative_scan presents the LATER element as
        # the first argument; e_b is the earlier one (verified empirically).
        A2, C2, J2 = e_a
        A1, C1, J1 = e_b
        Z = jnp.linalg.solve(_eye_like(A1) + _mm(C1, J2), _eye_like(A1))
        A12 = _mm(A2, _mm(Z, A1))
        C12 = _sym(_mm(A2, _mm(Z, _mm(C1, jnp.swapaxes(A2, -1, -2)))) + C2)
        Zt = jnp.swapaxes(Z, -1, -2)
        J12 = _sym(_mm(jnp.swapaxes(A1, -1, -2), _mm(Zt, _mm(J2, A1))) + J1)
        return A12, C12, J12

    _, _, Vxx = jax.lax.associative_scan(combine, (A_e, C_e, J_e), reverse=True)
    # Vxx[t] = value Hessian at time t, t = 0..N.

    # --- Phase 2: Vx by affine associative scan ------------------------------
    Vxx_next = Vxx[1:]  # (N,nx,nx)
    # M_t = A_tᵀ (I + Vxx' C_t)^{-1}
    Minv = jax.vmap(lambda Vn, Ct: jnp.linalg.solve(I_x + _mm(Vn, Ct), I_x))(Vxx_next, C)
    M = _mm(jnp.swapaxes(A, -1, -2), Minv)  # (N,nx,nx)
    c = quad.lx[:-1] + _mm(M, _mm(Vxx_next, b[..., None]))[..., 0]  # (N,nx)

    M_e = jnp.concatenate([M, jnp.zeros((1, nx, nx), dtype)], 0)
    c_e = jnp.concatenate([c, quad.lx[-1:]], 0)

    def combine_affine(e_a, e_b):
        M2, c2 = e_a  # later (first under reverse=True)
        M1, c1 = e_b  # earlier
        return _mm(M1, M2), c1 + _mm(M1, c2[..., None])[..., 0]

    _, Vx = jax.lax.associative_scan(combine_affine, (M_e, c_e), reverse=True)
    Vx_next = Vx[1:]  # (N,nx)

    # --- Phase 3: gains, vmapped over the horizon ----------------------------
    def gains(A_t, B_t, lu_t, luu_t, Vn, vn):
        Bt_ = B_t.T
        Qu = lu_t + _mm(Bt_, vn)
        Qux = _mm(Bt_, _mm(Vn, A_t))
        Quu = luu_t + _mm(Bt_, _mm(Vn, B_t))
        L = jnp.linalg.cholesky(Quu)
        bad = ~jnp.isfinite(L).all()
        Quu = Quu + jnp.where(bad, pd_bump, 0.0) * jnp.eye(nu, dtype=dtype)
        L = jnp.linalg.cholesky(Quu)
        K_t = -jax.scipy.linalg.cho_solve((L, True), Qux)
        k_t = -jax.scipy.linalg.cho_solve((L, True), Qu)
        return K_t, k_t

    K, kff = jax.vmap(gains)(A, B, quad.lu, luu_reg, Vxx_next, Vx_next)
    return K, kff
