"""Small-matrix SPD solves as pure jnp (no LAPACK-style custom calls).

XLA's `cholesky`/`triangular_solve` lower to blocked custom calls tuned for
large matrices; at nv=25 inside a sequential scan they cost more than the
rest of the dynamics step. This masked right-looking Cholesky + masked
substitution is plain vector arithmetic: it fuses into the surrounding
graph, batches trivially under vmap, and is the same algorithm to rounding.
Shares its structure with the in-kernel version in ops/riccati.py.

Measured on TPU v5 lite (H1 step chain): 2.1x faster than
cho_factor/cho_solve standalone — but DO NOT use it inside anything that
jacfwd/jvp differentiates through: cho_solve's JVP reuses the factorization
while this unrolled form pays full tangent cost per pivot (using it in the
dynamics step regressed the fused MPC solve 26→38 ms). Right tool for
plant-only rollouts, simulation-only paths, and Pallas kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

HP = jax.lax.Precision.HIGHEST


def cholesky_masked(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of an SPD (n,n) (or batched) matrix, unrolled
    n pivots. Row mask via iota (no captured constants — kernel-safe)."""
    n = A.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    S = A
    if A.ndim == 2:
        # Kernel-safe path: build L column-by-column with concatenation
        # (column .at-set lowers to an unsupported scatter in Mosaic).
        cols = []
        for k in range(n):
            colk = S[:, k]
            dk = colk[k]
            inv = jax.lax.rsqrt(dk)
            lk = jnp.where(rows >= k, colk * inv, 0.0)
            cols.append(lk[:, None])
            S = S - lk[:, None] * lk[None, :]
        return jnp.concatenate(cols, axis=1)
    L = jnp.zeros_like(A)
    for k in range(n):  # batched path (vmap-friendly .at updates)
        colk = S[..., :, k]
        dk = colk[..., k]
        inv = jax.lax.rsqrt(dk)
        lk = jnp.where(rows >= k, colk * inv[..., None], 0.0)
        L = L.at[..., :, k].set(lk)
        S = S - lk[..., :, None] * lk[..., None, :]
    return L


def solve_tri_masked(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve (L Lᵀ) X = B with B (n, m) (or batched (..., n, m)),
    L lower-triangular. 2-D row forms so every dot is a plain matmul
    (Mosaic-kernel-safe for the unbatched case)."""
    n = L.shape[-1]
    if L.ndim == 2:

        def set_row(M, row, k):
            # concat without empty slices (Mosaic rejects zero-size vectors)
            pieces = ([row] if k == 0 else [M[:k], row])
            if k < n - 1:
                pieces.append(M[k + 1 :])
            return jnp.concatenate(pieces, axis=0)

        Y = jnp.zeros_like(B)
        for k in range(n):  # forward: y[j>=k] still zero -> dot sums j<k
            yk = (B[k : k + 1, :] - jnp.matmul(L[k : k + 1, :], Y, precision=HP)) / L[k, k]
            Y = set_row(Y, yk, k)
        X = jnp.zeros_like(B)
        for i in range(n):  # backward with L^T rows = L columns
            k = n - 1 - i
            xk = (Y[k : k + 1, :] - jnp.matmul(L[:, k][None, :], X, precision=HP)) / L[k, k]
            X = set_row(X, xk, k)
        return X
    Y = jnp.zeros_like(B)
    for k in range(n):
        yk = (B[..., k, :] - jnp.einsum("...i,...im->...m", L[..., k, :], Y, precision=HP)) / L[..., k, k][..., None]
        Y = Y.at[..., k, :].set(yk)
    X = jnp.zeros_like(B)
    for i in range(n):
        k = n - 1 - i
        xk = (Y[..., k, :] - jnp.einsum("...i,...im->...m", L[..., :, k], X, precision=HP)) / L[..., k, k][..., None]
        X = X.at[..., k, :].set(xk)
    return X


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = A⁻¹ b for SPD A (n,n); b (n,) or (n,m)."""
    L = cholesky_masked(A)
    vec = b.ndim == A.ndim - 1
    B = b[..., :, None] if vec else b
    X = solve_tri_masked(L, B)
    return X[..., :, 0] if vec else X
