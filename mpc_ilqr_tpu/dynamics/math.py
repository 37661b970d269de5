"""Quaternion / rotation primitives (wxyz convention, MuJoCo-compatible).

All functions are pure jnp, broadcast over leading batch dimensions, and are
safe under jit/vmap/grad. The wxyz storage order matches MuJoCo qpos; the
reference's Pinocchio xyzw shim (derivatives.cpp:12-24) is unnecessary here
because the whole engine shares one convention.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) to unit norm."""
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def cross(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Component-form cross product over the last axis (..., 3).

    Equivalent to jnp.cross but lowers inside Pallas TPU kernels: jnp.cross
    lane-rolls the 3-wide last axis, which trips a Mosaic-internal tiling
    assert (layout.h offsets_[0] < tiling_[0]) on 2-D operands; the
    slice+stack form compiles (verified by probe kernels, round 2)."""
    u0, u1, u2 = u[..., 0], u[..., 1], u[..., 2]
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [u1 * v2 - u2 * v1, u2 * v0 - u0 * v2, u0 * v1 - u1 * v0], axis=-1
    )


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, both wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    # Constant-free form (a sign-vector literal would be a captured constant
    # inside Pallas kernels).
    return jnp.concatenate([q[..., :1], -q[..., 1:4]], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2 w (u × v) + 2 u × (u × v)
    uv = cross(u, v)
    return v + 2.0 * (w * uv + cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q: R(q)^T @ v."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) from quaternion(s) (..., 4) wxyz."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Quaternion exponential of a rotation vector phi (..., 3).

    Returns the unit quaternion representing a rotation of |phi| radians
    about phi/|phi|. Uses a Taylor-safe sinc to stay differentiable at 0.
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + 1e-24)
    half = 0.5 * theta
    # sin(half)/theta, stable near zero: 0.5 * sinc(half/pi)... use series guard
    small = theta2 < 1e-12
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.cos(half)
    return jnp.concatenate([w, k * phi], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Advance quaternion by body-local angular velocity over dt.

    MuJoCo free-joint convention (verified against mj_step): the angular
    velocity in qvel is expressed in the child body frame and integrates on
    the right: q' = q ⊗ exp(½ dt ω_local).
    """
    dq = quat_exp(omega_local * dt)
    return quat_normalize(quat_mul(q, dq))


def quat_log(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation-vector logarithm of unit quaternion(s): |log| = rotation
    angle, canonicalized to the w>=0 hemisphere (double-cover safe)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    w = q[..., 0]
    v = q[..., 1:4]
    vn = jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)
    angle = 2.0 * jnp.arctan2(vn, w)
    return v * (angle / vn)[..., None]


def quat_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion for rotation of `angle` about unit `axis`."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def cross_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [v]× with shape (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
