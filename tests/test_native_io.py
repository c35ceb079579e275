"""Native helper + OBJ IO tests (reference: util/shape_io tests,
serialization round-trips)."""
import os
import tempfile

import numpy as np
import pytest

from edyn_tpu.native import loader
from edyn_tpu.shapes import obj_io
from edyn_tpu.shapes.mesh import build_grid

OBJ = """\
# test cube + tet
v -1 0 -1 0.5 0.2 0.1
v 1 0 -1 0.5 0.2 0.1
v 1 0 1 0.5 0.2 0.1
v -1 0 1 0.5 0.2 0.1
f 1 2 3 4
"""


def _write_obj(text):
    fd, path = tempfile.mkstemp(suffix=".obj")
    with os.fdopen(fd, "w") as f:
        f.write(text)
    return path


def test_parse_obj_quad_triangulated():
    path = _write_obj(OBJ)
    verts, colors, faces = obj_io.parse_obj(path)
    assert verts.shape == (4, 3)
    assert faces.shape == (2, 3)  # quad -> 2 tris
    np.testing.assert_allclose(colors[0], [0.5, 0.2, 0.1])
    os.unlink(path)


def test_parse_obj_native_matches_python():
    path = _write_obj(OBJ)
    py = obj_io._parse_obj_python(path)
    if loader.lib() is not None:
        nat = loader.parse_obj(path)
        for a, b in zip(py, nat):
            np.testing.assert_allclose(a, b)
    os.unlink(path)


def test_load_trimesh_with_materials():
    path = _write_obj(OBJ)
    mesh = obj_io.load_tri_mesh_from_obj(path, friction_from_red=True)
    assert mesh.vertex_friction is not None
    np.testing.assert_allclose(mesh.vertex_friction, 0.5)
    os.unlink(path)


def test_native_adjacency_matches_python():
    # two triangles sharing an edge
    indices = np.array([[0, 1, 2], [2, 1, 3]], np.int64)
    normals = np.array([[0, 1, 0], [1, 0, 0]], np.float64)
    if loader.lib() is None:
        pytest.skip("native lib not built")
    adj = loader.adjacent_normals(indices, normals)
    # tri 0's edge (1,2) is shared -> neighbor normal [1,0,0]
    np.testing.assert_allclose(adj[0, 1], [1, 0, 0])
    # tri 1's shared edge is its edge 0 (2,1)
    np.testing.assert_allclose(adj[1, 0], [0, 1, 0])
    # boundary edges keep own normal
    np.testing.assert_allclose(adj[0, 0], [0, 1, 0])


def test_native_grid_matches_python():
    rng = np.random.default_rng(0)
    tv = rng.uniform(-5, 5, size=(50, 3, 3))
    tv[..., 1] *= 0.01  # flat-ish
    g_native, *_ = build_grid(tv, cell_size=1.0, cap=64)
    if loader.lib() is not None:
        import edyn_tpu.native.loader as L
        real = L.lib
        L.lib = lambda: None  # force python path
        try:
            g_py, *_ = build_grid(tv, cell_size=1.0, cap=64)
        finally:
            L.lib = real
        # same cell membership (order may differ)
        for c in range(g_native.shape[0] * g_native.shape[1]):
            a = set(g_native.reshape(-1, 64)[c]) - {-1}
            b = set(g_py.reshape(-1, 64)[c]) - {-1}
            assert a == b


def test_varint_roundtrip():
    if loader.lib() is None:
        pytest.skip("native lib not built")
    vals = np.array([5, 7, 8, 100, 3, -20, 1 << 20], np.int32)
    blob = loader.varint_encode(vals)
    out = loader.varint_decode(blob, 32)
    np.testing.assert_array_equal(out, vals)
    assert len(blob) < vals.nbytes  # actually compresses
