"""World checkpointing.

The reference has no world checkpointing — only per-component serialize()
functions and binary archives (SURVEY §5.4; include/edyn/serialization/).
Because the TPU world is one pytree, full save/restore is a flatten + npz (or
orbax when available), which strictly exceeds the reference's capability.
"""
from __future__ import annotations

import io
import json
from typing import Optional

import jax
import numpy as np

from ..config import Settings
from ..core.state import WorldState

# v2: r2 state additions (com, overflow counters, user dict, compound
#     child_type/params, convex disc_r/disc_axis, contact material scales,
#     joint angle, params 20->60).
# v3: contact keys int32 -> uint32, roll_axis column.
# v4: carried fat broadphase boxes (bp_aabb_min/max), backfillable from v3.
# v5: slot-stable manifold table (contacts/sort_key|sort_slot|sort_pvalid,
#     rebuilt from contacts/key on load), overflow counter 4 -> 5, island
#     steady-skip tracking (edge_pointed/labels_stable/island_stable_steps —
#     zero defaults just disengage the skip until the world re-stabilizes).
# v6: broadphase pair-list carry flag (bp_carry_ok — zero default just
#     re-enumerates pairs on the first step after load).
FORMAT_VERSION = 6
MIN_SUPPORTED_VERSION = 3

# Leaves added after v3, backfilled with self-healing defaults when loading
# an older checkpoint: fn(template_leaf, file_dict) -> array. The broadphase
# admission boxes are recomputed every step, so reversed bounds self-heal;
# the manifold sort view is reconstructed from the saved key column (v3/v4
# tables were key-sorted, but an argsort is correct either way).
_BACKFILL = {
    "bp_aabb_min": lambda leaf, d: np.full(leaf.shape, 1e30, leaf.dtype),
    "bp_aabb_max": lambda leaf, d: np.full(leaf.shape, -1e30, leaf.dtype),
    "contacts/sort_key": lambda leaf, d: np.sort(d["contacts/key"]),
    "contacts/sort_slot": lambda leaf, d: np.where(
        np.sort(d["contacts/key"]) == np.iinfo(np.uint32).max,
        leaf.shape[0], np.argsort(d["contacts/key"], kind="stable")
    ).astype(np.int32),
    "contacts/sort_pvalid": lambda leaf, d: np.asarray(
        d["contacts/valid"])[np.argsort(d["contacts/key"], kind="stable")],
    "overflow": lambda leaf, d: np.concatenate(
        [np.asarray(d["overflow"], leaf.dtype),
         np.zeros(leaf.shape[0] - d["overflow"].shape[0], leaf.dtype)]),
    "edge_pointed": lambda leaf, d: np.zeros(leaf.shape, leaf.dtype),
    "labels_stable": lambda leaf, d: np.zeros(leaf.shape, leaf.dtype),
    "island_stable_steps": lambda leaf, d: np.zeros(leaf.shape, leaf.dtype),
    "bp_carry_ok": lambda leaf, d: np.zeros(leaf.shape, leaf.dtype),
}


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):        # GetAttrKey (dataclass field)
            parts.append(p.name)
        elif hasattr(p, "key"):       # DictKey (user components)
            parts.append(str(p.key))
        else:                          # SequenceKey etc.
            parts.append(str(getattr(p, "idx", p)))
    return "/".join(parts)


def _paths(state) -> dict:
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    return {_path_key(path): np.asarray(leaf) for path, leaf in flat}


def save_world(path_or_file, state: WorldState, settings: Optional[Settings] = None):
    """Serialize the whole world (and optionally settings) to an .npz."""
    arrays = _paths(state)
    meta = {"format": FORMAT_VERSION}
    if settings is not None:
        meta["settings"] = {k: (list(v) if isinstance(v, tuple) else v)
                            for k, v in settings.__dict__.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path_or_file, **arrays)


def load_world(path_or_file, template: Optional[WorldState] = None):
    """Restore (state, settings|None). With ``template`` the arrays are
    validated against an existing world's treedef; without it the state is
    rebuilt structurally (capacities come from the file)."""
    data = np.load(path_or_file)
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    fmt = meta.get("format", 0)
    if fmt < MIN_SUPPORTED_VERSION or fmt > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format {fmt} unsupported (this build reads "
            f"{MIN_SUPPORTED_VERSION}..{FORMAT_VERSION}); re-save the world "
            f"with the version that wrote it")
    settings = None
    if "settings" in meta:
        s = dict(meta["settings"])
        if "gravity" in s:
            s["gravity"] = tuple(s["gravity"])
        settings = Settings(**s)

    if template is None:
        # rebuild via a zero state of matching capacities
        import dataclasses as _dc
        from ..core.state import PolyTable
        from ..shapes.mesh import MeshTable
        N = data["pos"].shape[0]
        M = data["contacts/key"].shape[0]
        J = data["joints/jtype"].shape[0]
        poly = PolyTable(*[jax.numpy.asarray(data[f"poly/{f.name}"])
                           for f in _dc.fields(PolyTable)]) \
            if data["poly/verts"].shape[0] else PolyTable.empty()
        mesh = MeshTable(*[jax.numpy.asarray(data[f"mesh/{f.name}"])
                           for f in _dc.fields(MeshTable)]) \
            if data["mesh/tri_verts"].shape[0] else MeshTable.empty()
        from ..shapes.convex import ConvexTable
        from ..shapes.compound import CompoundTable
        convex = ConvexTable(*[jax.numpy.asarray(data[f"convex/{f.name}"])
                               for f in _dc.fields(ConvexTable)])
        compound = CompoundTable(*[jax.numpy.asarray(data[f"compound/{f.name}"])
                                   for f in _dc.fields(CompoundTable)]) \
            if data["compound/child_row"].shape[0] else CompoundTable.empty()
        template = WorldState.zeros(N, M, J, poly, mesh, convex, compound)
        user = {k[len("user/"):]: jax.numpy.asarray(data[k])
                for k in data.files if k.startswith("user/")}
        if user:
            template = _dc.replace(template, user=user)

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = _path_key(path)
        if key in _BACKFILL and (key not in data
                                 or data[key].shape != leaf.shape):
            leaves.append(jax.numpy.asarray(
                _BACKFILL[key](np.asarray(leaf), data), dtype=leaf.dtype))
            continue
        arr = data[key]
        assert arr.shape == leaf.shape, f"{key}: {arr.shape} != {leaf.shape}"
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, settings


def world_to_bytes(state: WorldState, settings: Optional[Settings] = None) -> bytes:
    buf = io.BytesIO()
    save_world(buf, state, settings)
    return buf.getvalue()


def world_from_bytes(blob: bytes, template: Optional[WorldState] = None):
    return load_world(io.BytesIO(blob), template)
