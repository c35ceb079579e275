"""Vector math on batched arrays.

TPU-native equivalent of the reference's ``math/vector3.hpp`` /
``math/vector2.hpp`` (reference: include/edyn/math/vector3.hpp:1-331). All
functions are shape-polymorphic over leading batch dimensions and operate on
trailing-dim-3 arrays, so they vectorize over the whole world state.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-9


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    """Component-form cross product — measurably faster than jnp.cross on TPU
    (avoids its roll-based lowering)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack([ay * bz - az * by,
                      az * bx - ax * bz,
                      ax * by - ay * bx], axis=-1)


def length_sqr(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_sqr(v))


def normalize(v, eps: float = EPS):
    """Safe normalize: returns zeros for (near-)zero vectors."""
    l2 = length_sqr(v)
    inv = jnp.where(l2 > eps, 1.0 / jnp.sqrt(jnp.maximum(l2, eps)), 0.0)
    return v * inv[..., None]


def normalize_or(v, fallback, eps: float = EPS):
    """Normalize, substituting ``fallback`` where ``v`` is near zero."""
    l2 = length_sqr(v)
    ok = l2 > eps
    inv = 1.0 / jnp.sqrt(jnp.maximum(l2, eps))
    return jnp.where(ok[..., None], v * inv[..., None], fallback)


def project_direction(v, n):
    """Component of ``v`` orthogonal to unit direction ``n``
    (reference: include/edyn/math/vector3.hpp project_direction)."""
    return v - n * dot(v, n)[..., None]


def project_plane(p, origin, n):
    return p - n * dot(p - origin, n)[..., None]


def skew(v):
    """Skew-symmetric cross-product matrix of v: skew(v) @ u == v x u
    (reference: include/edyn/math/matrix3x3.hpp skew_matrix)."""
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


def orthonormal_basis(n):
    """Two unit tangents orthogonal to unit normal ``n``, branchlessly.

    Used to build friction row directions (reference picks tangents from the
    relative velocity in src/edyn/dynamics/.../contact_constraint.cpp; a fixed
    basis from the normal is the standard batched alternative). Uses the
    Duff et al. / Pixar branchless ONB construction.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t1 = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    t2 = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t1, t2


def clamp_length(v, max_len):
    l = length(v)
    scale = jnp.where(l > max_len, max_len / jnp.maximum(l, EPS), 1.0)
    return v * scale[..., None]
