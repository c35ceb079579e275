"""Shape descriptors and packed parameter tables.

TPU-native replacement for the reference's ``shapes_tuple``/``shapes_variant_t``
type registry (include/edyn/shapes/shapes.hpp:23-55): instead of a C++ variant
per entity, every body carries a ``shape_type`` enum and a fixed-width
``shape_params[4]`` row; polyhedra/compounds/trimeshes index into padded side
tables. This keeps the hot path fully vectorized (type-bucketed kernels gather
by ``shape_type``).
"""
from .params import (
    SphereShape, BoxShape, CapsuleShape, CylinderShape, PlaneShape,
    PolyhedronShape, CompoundShape, MeshShape, PagedMeshShape,
    ShapeType, PolyhedronTable, CompoundTable, pack_polyhedra,
)
from .aabb import compute_aabbs
from .inertia import moment_of_inertia
from .volume import mesh_centroid, shape_volume

__all__ = [
    "SphereShape", "BoxShape", "CapsuleShape", "CylinderShape", "PlaneShape",
    "PolyhedronShape", "CompoundShape", "MeshShape", "PagedMeshShape",
    "ShapeType", "PolyhedronTable", "CompoundTable", "pack_polyhedra",
    "compute_aabbs", "moment_of_inertia", "shape_volume", "mesh_centroid",
]
