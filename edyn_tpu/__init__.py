"""edyn_tpu — a TPU-native rigid-body physics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Edyn physics
engine (reference: xissburg/edyn, C++17/EnTT). The ECS registry becomes a
fixed-capacity structure-of-arrays pytree, broadphase/narrowphase/solver are
batched type-bucketed kernels fused into a single jit-compiled step, and
islands/sleeping are masks — the whole world steps on-device with no host
round-trips. See SURVEY.md at the repo root for the full design mapping.
"""
from .config import Settings
from .core.builder import Material, RigidBodyDef, WorldBuilder
from .core.state import (
    KIND_DYNAMIC, KIND_KINEMATIC, KIND_STATIC, WorldState,
)
from .core.world import World, derive_meta, make_world
from .shapes import (
    BoxShape, CapsuleShape, CompoundShape, CylinderShape, MeshShape,
    PagedMeshShape, PlaneShape, PolyhedronShape, SphereShape,
    mesh_centroid, shape_volume,
)
from .constraints.api import (
    dof, make_cone_constraint, make_cvjoint_constraint, make_distance_constraint,
    make_generic_constraint, make_gravity_constraint, make_hinge_constraint,
    make_null_constraint, make_point_constraint, make_soft_distance_constraint,
)
from .simulation.stepper import SceneMeta, physics_step

__version__ = "0.1.0"

__all__ = [
    "Settings", "Material", "RigidBodyDef", "WorldBuilder", "WorldState",
    "World", "make_world", "derive_meta", "SceneMeta", "physics_step",
    "KIND_DYNAMIC", "KIND_KINEMATIC", "KIND_STATIC",
    "SphereShape", "BoxShape", "CapsuleShape", "CylinderShape", "PlaneShape",
    "PolyhedronShape", "CompoundShape", "MeshShape", "PagedMeshShape",
    "make_distance_constraint", "make_soft_distance_constraint",
    "make_point_constraint", "make_hinge_constraint", "make_cone_constraint",
    "make_generic_constraint", "make_cvjoint_constraint", "dof",
    "make_gravity_constraint", "make_null_constraint",
    "shape_volume", "mesh_centroid",
]
