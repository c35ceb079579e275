"""Quaternion math, batched. Storage order is (x, y, z, w) to match the
reference (include/edyn/math/quaternion.hpp:10-14). All functions broadcast
over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import vec


def identity(shape=()):
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def mul(p, q):
    """Hamilton product p*q (reference: include/edyn/math/quaternion.hpp operator*)."""
    px, py, pz, pw = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
            pw * qw - px * qx - py * qy - pz * qz,
        ],
        axis=-1,
    )


def conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0])


def normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def rotate(q, v):
    """Rotate vector v by unit quaternion q
    (reference: include/edyn/math/quaternion.hpp rotate)."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * vec.cross(u, v)
    return v + w * t + vec.cross(u, t)


def rotate_inv(q, v):
    return rotate(conjugate(q), v)


def from_axis_angle(axis, angle):
    """(reference: include/edyn/math/quaternion.hpp quaternion_axis_angle)."""
    angle = jnp.asarray(angle)
    half = angle * 0.5
    s = jnp.sin(half)
    xyz = vec.normalize(jnp.asarray(axis)) * s[..., None]
    return jnp.concatenate([xyz, jnp.cos(half)[..., None]], axis=-1)


def integrate(q, w, dt):
    """Integrate orientation by angular velocity over dt.

    Matches the reference's exponential-map integration
    (include/edyn/math/quaternion.hpp integrate,
    src/edyn/math/quaternion.cpp:1-46): converts w*dt to an axis-angle
    rotation with a small-angle Taylor guard and composes it.
    """
    theta_sq = vec.length_sqr(w) * dt * dt
    # sin(theta/2)/theta with Taylor fallback for small angles.
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-30))
    half = theta * 0.5
    small = theta_sq < 1e-8
    s = jnp.where(small, 0.5 * dt - theta_sq * dt / 48.0,
                  jnp.sin(half) / jnp.maximum(theta, 1e-30) * dt)
    c = jnp.where(small, 1.0 - theta_sq * 0.125, jnp.cos(half))
    dq = jnp.concatenate([w * s[..., None], c[..., None]], axis=-1)
    return normalize(mul(dq, q))


def to_matrix(q):
    """Rotation matrix of unit quaternion (reference:
    include/edyn/math/matrix3x3.hpp to_matrix3x3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def slerp(q0, q1, t):
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0, -q1, q1)
    d = jnp.abs(d)
    # Fall back to lerp when nearly parallel.
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    near = sin_theta < 1e-5
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    return normalize(q0 * w0[..., None] + q1 * w1[..., None])


def shortest_arc(v0, v1):
    """Quaternion rotating unit vector v0 onto v1 (reference:
    include/edyn/math/quaternion.hpp shortest_arc). Batched [...,3]."""
    import jax.numpy as jnp
    from . import vec
    c = vec.cross(v0, v1)
    d = jnp.sum(v0 * v1, -1, keepdims=True)
    w = 1.0 + d
    # antiparallel fallback: rotate pi about any orthogonal axis
    t1, _ = vec.orthonormal_basis(v0)
    anti = (w < 1e-6)
    xyz = jnp.where(anti, t1, c)
    q = jnp.concatenate([xyz, jnp.where(anti, jnp.zeros_like(w), w)], -1)
    return normalize(q)
