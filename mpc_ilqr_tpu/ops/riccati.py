"""Pallas TPU kernel: the full Riccati backward pass in one kernel launch.

The lax.scan backward pass (ilqr/solver.py) lowers to ~25 sequential
iterations of many small XLA kernels; this kernel keeps the entire recursion
resident in VMEM — A/B/quadratics are loaded once, the (Vx, Vxx) carry never
leaves VMEM, and the 19×19 SPD solves run as an in-kernel masked Cholesky +
triangular substitution. One launch for the whole pass.

Mosaic constraints shape the implementation: no dynamic indexing of values
(pivot access is a masked matvec), no scalar-output dot_general (reductions
via jnp.sum, vectors kept 2-D as (P,1) columns).

Shapes are padded to TPU-friendly tiles: nx→PX, nu→PU (multiples of 8; the
lane dimension pads to 128 internally). Padded diagonal entries of Quu are
set to 1 so the factorization stays defined and the padded gain rows/cols
come out exactly zero.

Numerics match ilqr.solver.backward_pass (same regularization + PD-bump
policy, ilqr.cpp:250-309); tests/test_ops.py asserts agreement to f32
round-off. Select with ILQRConfig(backward="pallas").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HP = jax.lax.Precision.HIGHEST


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _dot(a, b):
    return jnp.matmul(a, b, precision=HP)


def _chol_masked(Amat, n, P):
    """Cholesky of the leading n×n block of the padded (P,P) SPD matrix.

    Right-looking outer-product form; pivot access via masked matvecs so the
    per-pivot work is fully vectorized (Mosaic forbids dynamic value
    indexing). n sequential pivots.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)  # (P,1)

    def body(k, carry):
        S, L = carry
        sel = (rows == k).astype(S.dtype)  # (P,1)
        colk = _dot(S, sel)  # (P,1) = S[:, k]
        dk = jnp.sum(colk * sel)  # S[k, k]
        inv = jax.lax.rsqrt(dk)
        lk = jnp.where(rows >= k, colk * inv, 0.0)  # (P,1)
        L = L + _dot(lk, sel.T)
        S = S - _dot(lk, lk.T)
        return S, L

    _, L = jax.lax.fori_loop(0, n, body, (Amat, jnp.zeros_like(Amat)))
    return L


def _solve_chol(L, Bmat, n, P):
    """Solve (L Lᵀ) X = B, B padded (P, M). Masked substitution; y[j ≥ k]
    are still zero at pivot k, so full dots sum exactly j < k."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)

    def fwd(k, Y):
        sel = (rows == k).astype(L.dtype)  # (P,1)
        Lk = _dot(sel.T, L)  # (1,P) = L[k, :]
        Lkk = jnp.sum(Lk * sel.T)
        bk = _dot(sel.T, Bmat)  # (1,M)
        yk = (bk - _dot(Lk, Y)) / Lkk
        return Y + _dot(sel, yk)

    Y = jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(Bmat))

    def bwd(i, X):
        k = n - 1 - i
        sel = (rows == k).astype(L.dtype)
        Lcol = _dot(L, sel)  # (P,1) = L[:, k] = Lᵀ[k, :]ᵀ
        Lkk = jnp.sum(Lcol * sel)
        yk = _dot(sel.T, Y)  # (1,M)
        xk = (yk - _dot(Lcol.T, X)) / Lkk
        return X + _dot(sel, xk)

    return jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(Bmat))


def _riccati_kernel(N, nx, nu, PX, PU, pd_bump,
                    A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, reg_ref,
                    K_ref, kff_ref):
    f32 = jnp.float32
    reg = reg_ref[0]
    urows = jax.lax.broadcasted_iota(jnp.int32, (PU, 1), 0)  # (PU,1)
    eye_u = (jax.lax.broadcasted_iota(jnp.int32, (PU, PU), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (PU, PU), 1)).astype(f32)
    # Padded Quu diagonal: 1 beyond nu so the factorization stays defined.
    pad_diag = eye_u * jnp.where(urows >= nu, 1.0, 0.0).astype(f32)
    umask = jnp.where(urows < nu, 1.0, 0.0).astype(f32)  # (PU,1)

    def body(i, carry):
        Vx, Vxx = carry  # (PX,1), (PX,PX)
        t = N - 1 - i
        A_t = A_ref[t]  # (PX, PX)
        B_t = B_ref[t]  # (PX, PU)
        At = A_t.T
        Bt = B_t.T
        Qx = lx_ref[t] + _dot(At, Vx)  # (PX,1)
        Qu = lu_ref[t] + _dot(Bt, Vx)  # (PU,1)
        AtV = _dot(At, Vxx)
        BtV = _dot(Bt, Vxx)
        Qxx = lxx_ref[t] + _dot(AtV, A_t)
        Qxu = _dot(AtV, B_t)  # (PX, PU)
        Quu = luu_ref[t] + _dot(BtV, B_t) + reg * eye_u + pad_diag

        L = _chol_masked(Quu, nu, PU)
        bad = 1.0 - jnp.isfinite(L).all().astype(f32)
        Quu = Quu + bad * pd_bump * eye_u
        L = _chol_masked(Quu, nu, PU)

        rhs = jnp.concatenate([Qxu.T, Qu], axis=1)  # (PU, PX+1)
        sol = -_solve_chol(L, rhs, nu, PU) * umask
        K_t = sol[:, :PX]
        k_t = sol[:, PX:]  # (PU,1)

        K_ref[t] = K_t
        kff_ref[t] = k_t

        KT = K_t.T
        Vx_n = Qx + _dot(KT, _dot(Quu, k_t) + Qu) + _dot(Qxu, k_t)
        Vxx_n = Qxx + _dot(KT, _dot(Quu, K_t)) + _dot(KT, Qxu.T) + _dot(Qxu, K_t)
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        return Vx_n, Vxx_n

    jax.lax.fori_loop(0, N, body, (lx_ref[N], lxx_ref[N]))


def backward_pass_pallas(A, B, lx, lu, lxx, luu, reg, pd_bump, interpret=False):
    """Drop-in replacement for ilqr.solver.backward_pass.

    A (N,nx,nx), B (N,nx,nu), lx (N+1,nx), lu (N,nu), lxx (N+1,nx,nx),
    luu (N,nu,nu), reg scalar. Returns (K (N,nu,nx), kff (N,nu)).
    """
    N, nx, _ = A.shape
    nu = B.shape[-1]
    PX = _round_up(nx, 8)
    PU = _round_up(nu, 8)
    f32 = jnp.float32

    padA = jnp.zeros((N, PX, PX), f32).at[:, :nx, :nx].set(A.astype(f32))
    padB = jnp.zeros((N, PX, PU), f32).at[:, :nx, :nu].set(B.astype(f32))
    padlx = jnp.zeros((N + 1, PX, 1), f32).at[:, :nx, 0].set(lx.astype(f32))
    padlu = jnp.zeros((N, PU, 1), f32).at[:, :nu, 0].set(lu.astype(f32))
    padlxx = jnp.zeros((N + 1, PX, PX), f32).at[:, :nx, :nx].set(lxx.astype(f32))
    padluu = jnp.zeros((N, PU, PU), f32).at[:, :nu, :nu].set(luu.astype(f32))
    regv = jnp.asarray([reg], f32)

    kernel = functools.partial(_riccati_kernel, N, nx, nu, PX, PU, float(pd_bump))
    K, kff = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, PU, PX), f32),
            jax.ShapeDtypeStruct((N, PU, 1), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(padA, padB, padlx, padlu, padlxx, padluu, regv)
    return K[:, :nu, :nx].astype(A.dtype), kff[:, :nu, 0].astype(A.dtype)
