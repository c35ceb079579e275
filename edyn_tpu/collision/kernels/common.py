"""Shared narrowphase kernel infrastructure.

Kernel contract (the batched analogue of the reference's
``collide(shA, shB, ctx, result)`` overloads, include/edyn/collision/collide.hpp:43+):
every kernel is vectorized over K gathered pairs and returns a ``ContactResult``
of up to 4 points per pair. Normals are world-space unit vectors pointing from
body B toward body A (the reference's "axis oriented toward A" SAT convention,
SURVEY A.3); pivots are in each body's object space; ``distance`` is the signed
separation along the normal (negative = penetrating). Points with separation
above the collision threshold are masked out (speculative-contact margin,
config/constants.hpp collision_threshold).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...math import quat, vec

ATTACH_NONE, ATTACH_A, ATTACH_B = 0, 1, 2


def _dc(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class ContactResult:
    """Batched collision_result (reference: include/edyn/collision/collision_result.hpp:13-50)."""
    point_valid: jnp.ndarray  # [K,4] bool
    pivot_a: jnp.ndarray      # [K,4,3] object space of A
    pivot_b: jnp.ndarray      # [K,4,3] object space of B
    normal: jnp.ndarray       # [K,4,3] world, B -> A
    distance: jnp.ndarray     # [K,4]
    attachment: jnp.ndarray   # [K,4] int32
    friction_scale: jnp.ndarray     # [K,4] per-point surface material scale
    restitution_scale: jnp.ndarray  # [K,4]

    @staticmethod
    def empty(K: int) -> "ContactResult":
        return ContactResult(
            point_valid=jnp.zeros((K, 4), bool),
            pivot_a=jnp.zeros((K, 4, 3)),
            pivot_b=jnp.zeros((K, 4, 3)),
            normal=jnp.zeros((K, 4, 3)),
            distance=jnp.zeros((K, 4)),
            attachment=jnp.zeros((K, 4), jnp.int32),
            friction_scale=jnp.ones((K, 4)),
            restitution_scale=jnp.ones((K, 4)),
        )

    def swapped(self) -> "ContactResult":
        """Swap roles of A and B (used when the bucket's canonical type order
        reversed the bodies; reference: swap_collide, collide.hpp)."""
        attach = jnp.where(self.attachment == ATTACH_A, ATTACH_B,
                           jnp.where(self.attachment == ATTACH_B, ATTACH_A,
                                     ATTACH_NONE))
        return ContactResult(
            point_valid=self.point_valid,
            pivot_a=self.pivot_b,
            pivot_b=self.pivot_a,
            normal=-self.normal,
            distance=self.distance,
            attachment=attach,
            friction_scale=self.friction_scale,
            restitution_scale=self.restitution_scale,
        )


def axis_onehot(axis_f):
    """float axis index (0/1/2) -> one-hot unit vector [...,3]."""
    idx = jnp.arange(3.0)
    return jnp.where(jnp.abs(idx - axis_f[..., None]) < 0.5, 1.0, 0.0)


def make_result(pos_a, orn_a, pos_b, orn_b, p_world_a, p_world_b, normal,
                distance, point_valid, attachment, threshold,
                friction_scale=None, restitution_scale=None):
    """Assemble a ContactResult from world-space contact data.

    p_world_a/p_world_b: [K,4,3] contact points on each body's surface in
    world space. Converts to object-space pivots like the reference does when
    it stores pivotA/pivotB.
    """
    point_valid = point_valid & (distance < threshold)
    pivot_a = quat.rotate_inv(orn_a[:, None, :], p_world_a - pos_a[:, None, :])
    pivot_b = quat.rotate_inv(orn_b[:, None, :], p_world_b - pos_b[:, None, :])
    ones = jnp.ones_like(distance)
    return ContactResult(
        point_valid=point_valid,
        pivot_a=pivot_a,
        pivot_b=pivot_b,
        normal=jnp.broadcast_to(normal, pivot_a.shape),
        distance=distance,
        attachment=jnp.broadcast_to(attachment, point_valid.shape).astype(jnp.int32),
        friction_scale=friction_scale if friction_scale is not None else ones,
        restitution_scale=(restitution_scale if restitution_scale is not None
                           else ones),
    )


def reduce_to_4(cand_pos, cand_depth, cand_valid):
    """Select <=4 of C candidate points maximizing coverage.

    Batched equivalent of the reference's insertion heuristic
    (insertion_point_index, include/edyn/math/geom.hpp:264 +
    collision_result::maybe_add_point): keep the deepest point, then the
    farthest from it, then the point maximizing triangle area, then the point
    maximizing quad area.

    cand_pos:   [K,C,3] world positions
    cand_depth: [K,C]   signed distance (smaller = deeper = more important)
    cand_valid: [K,C]
    Returns indices [K,4] int32 and validity [K,4].
    """
    big = 1e30
    depth = jnp.where(cand_valid, cand_depth, big)
    i0 = jnp.argmin(depth, axis=-1)
    v0 = jnp.take_along_axis(cand_valid, i0[:, None], axis=1)[:, 0]
    p0 = jnp.take_along_axis(cand_pos, i0[:, None, None].repeat(3, -1), axis=1)[:, 0]

    d0 = jnp.sum((cand_pos - p0[:, None, :]) ** 2, -1)
    d0 = jnp.where(cand_valid, d0, -big)
    d0 = jnp.where(jnp.arange(d0.shape[1])[None, :] == i0[:, None], -big, d0)
    i1 = jnp.argmax(d0, axis=-1)
    v1 = v0 & (jnp.take_along_axis(d0, i1[:, None], axis=1)[:, 0] > 0)
    p1 = jnp.take_along_axis(cand_pos, i1[:, None, None].repeat(3, -1), axis=1)[:, 0]

    # triangle area maximization: |cross(p-p0, p1-p0)|
    e01 = p1 - p0
    area = vec.length_sqr(vec.cross(cand_pos - p0[:, None, :], e01[:, None, :]))
    taken = (jnp.arange(area.shape[1])[None, :] == i0[:, None]) | \
            (jnp.arange(area.shape[1])[None, :] == i1[:, None])
    area = jnp.where(cand_valid & ~taken, area, -big)
    i2 = jnp.argmax(area, axis=-1)
    v2 = v1 & (jnp.take_along_axis(area, i2[:, None], axis=1)[:, 0] > 1e-12)
    p2 = jnp.take_along_axis(cand_pos, i2[:, None, None].repeat(3, -1), axis=1)[:, 0]

    # quad: farthest from the triangle (sum of distances to the 3 chosen points)
    d_all = (jnp.sum((cand_pos - p0[:, None, :]) ** 2, -1)
             + jnp.sum((cand_pos - p1[:, None, :]) ** 2, -1)
             + jnp.sum((cand_pos - p2[:, None, :]) ** 2, -1))
    taken = taken | (jnp.arange(area.shape[1])[None, :] == i2[:, None])
    d_all = jnp.where(cand_valid & ~taken, d_all, -big)
    i3 = jnp.argmax(d_all, axis=-1)
    v3 = v2 & (jnp.take_along_axis(d_all, i3[:, None], axis=1)[:, 0] > 0)

    idx = jnp.stack([i0, i1, i2, i3], axis=-1).astype(jnp.int32)
    validity = jnp.stack([v0, v1, v2, v3], axis=-1)
    return idx, validity


def gather_points(cand, idx):
    """cand [K,C,...], idx [K,4] -> [K,4,...]."""
    shape = idx.shape + (1,) * (cand.ndim - 2)
    return jnp.take_along_axis(cand, idx.reshape(shape), axis=1)
