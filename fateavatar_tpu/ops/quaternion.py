"""Quaternion / rotation utilities (pure JAX).

Conventions follow the wxyz ("real first") quaternion layout used across the
avatar stack (reference: pytorch3d.transforms usage in model/fateavatar.py:8-13
and the quaternion->matrix code in diff-gaussian-rasterization
cuda_rasterizer/forward.cu:118-152).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b for wxyz quaternions. Shapes broadcast."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """wxyz quaternion -> 3x3 rotation matrix. ``q`` is normalized first.

    Matches the (normalized) rotation construction of the CUDA rasterizer's
    ``computeCov3D`` (forward.cu:126-138).
    """
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    m = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> wxyz quaternion (w >= 0 branchless variant).

    Uses the numerically-stable four-branch construction selected with
    ``jnp.where`` so it is jit/vmap friendly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    def _sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate 0: trace-dominant
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    # candidate 1: m00 dominant
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    # candidate 2: m11 dominant
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    # candidate 3: m22 dominant
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    # pick the candidate with the largest leading term (all are 4*q_k^2)
    lead = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22,
                      1.0 + m22 - m00 - m11], axis=-1)
    best = jnp.argmax(lead, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q.squeeze(-2)
    denom = 2.0 * _sqrt(jnp.take_along_axis(lead, best[..., None], axis=-1))
    q = q / denom
    # canonicalize sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def axis_angle_to_matrix(aa: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rodrigues formula, matching flame/lbs.py:238-269 (batch_rodrigues)."""
    angle = jnp.linalg.norm(aa + eps, axis=-1, keepdims=True)
    axis = aa / angle
    rx, ry, rz = jnp.moveaxis(axis, -1, 0)
    zeros = jnp.zeros_like(rx)
    k = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    eye = jnp.eye(3, dtype=aa.dtype)
    return eye + sin * k + (1.0 - cos) * (k @ k)


def quat_to_axis_angle(q: jax.Array) -> jax.Array:
    q = quat_normalize(q)
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1).clip(_EPS)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    # small-angle safe scale: angle / sin(angle/2) -> 2 as angle -> 0
    scale = jnp.where(vnorm < 1e-6, 2.0, angle / vnorm)
    return v * scale[..., None]


def axis_angle_to_quat(aa: jax.Array, eps: float = 1e-8) -> jax.Array:
    angle = jnp.linalg.norm(aa + eps, axis=-1, keepdims=True)
    half = 0.5 * angle
    w = jnp.cos(half)
    xyz = aa / angle * jnp.sin(half)
    return jnp.concatenate([w, xyz], axis=-1)
