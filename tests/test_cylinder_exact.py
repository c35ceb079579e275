"""Exact cylinder narrowphase goldens: analytically placed cylinders through
the unified disc-swept support kernel (mirrors the reference's bespoke
collide_cylinder_* feature classification —
src/edyn/collision/collide/collide_cylinder_cylinder.cpp,
collide_cylinder_box.cpp: cap-face / cap-edge (rim) / side features)."""
import numpy as np
import jax.numpy as jnp

from edyn_tpu.collision.kernels.support import Side
from edyn_tpu.collision.kernels.support_sat import collide_support
from edyn_tpu.shapes.convex import shape_convex_data
from edyn_tpu.shapes.params import ShapeType
from edyn_tpu.math import quat

THRESH = 0.02


def _side(stype, params, pos, orn=(0, 0, 0, 1)):
    v, r, f, e, dr, da = shape_convex_data(int(stype), params)
    V = max(len(v), 1)
    F = max(len(f), 1)
    E = max(len(e), 1)
    verts = np.zeros((V, 3), np.float32)
    verts[:len(v)] = v
    fn = np.zeros((F, 3), np.float32)
    fn[:len(f)] = f
    ed = np.zeros((E, 3), np.float32)
    ed[:len(e)] = e
    vm = np.zeros((V,), bool)
    vm[:len(v)] = True
    fm = np.zeros((F,), bool)
    fm[:len(f)] = True
    em = np.zeros((E,), bool)
    em[:len(e)] = True
    prm = np.zeros((4,), np.float32)
    prm[:len(params)] = params
    return Side(
        pos=jnp.asarray([pos], jnp.float32), orn=jnp.asarray([orn], jnp.float32),
        params=jnp.asarray([prm]),
        verts=jnp.asarray([verts]), vert_mask=jnp.asarray([vm]),
        radius=jnp.asarray([r], jnp.float32),
        face_normals=jnp.asarray([fn]), face_mask=jnp.asarray([fm]),
        edge_dirs=jnp.asarray([ed]), edge_mask=jnp.asarray([em]),
        disc_r=jnp.asarray([dr], jnp.float32),
        disc_axis=jnp.asarray([da], jnp.float32))


def _pts(res):
    pv = np.asarray(res.point_valid[0])
    return [i for i in range(4) if pv[i]]


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    h = np.deg2rad(deg) / 2
    return tuple(np.concatenate([axis * np.sin(h), [np.cos(h)]]).tolist())


CYL = (0.5, 1.0, 0)   # radius 0.5, half-length 1, x-axis


def test_support_exactness_radial():
    """Support along any radial direction must be exactly r (the 12-gon
    approximation this replaces was short by r*(1-cos(15deg)))."""
    from edyn_tpu.collision.kernels.support import support_projection
    A = _side(ShapeType.CYLINDER, CYL, (0, 0, 0))
    for ang in np.linspace(0, 2 * np.pi, 17):
        d = jnp.asarray([[0.0, np.cos(ang), np.sin(ang)]], jnp.float32)
        p = float(support_projection(A, d)[0])
        assert abs(p - 0.5) < 1e-6, f"radial support off at {ang}: {p}"


def test_cap_on_cap_coaxial():
    """Two coaxial cylinders cap to cap: contact patch on the shared disc,
    >=3 points spread over the rim, normal along the axis."""
    A = _side(ShapeType.CYLINDER, CYL, (2.001, 0, 0))
    B = _side(ShapeType.CYLINDER, CYL, (0, 0, 0))
    res = collide_support(A, B, THRESH)
    pts = _pts(res)
    assert len(pts) >= 3
    n = np.asarray(res.normal[0, pts[0]])
    np.testing.assert_allclose(n, [1, 0, 0], atol=1e-5)
    for i in pts:
        assert abs(float(res.distance[0, i]) - 0.001) < 1e-4
        # pivots on A's -x cap, radius <= 0.5
        pa = np.asarray(res.pivot_a[0, i])
        assert abs(pa[0] + 1.0) < 1e-4
        assert np.hypot(pa[1], pa[2]) <= 0.5 + 1e-4


def test_side_parallel_line_contact():
    """Two parallel cylinders side by side: line contact -> 2 end points,
    radial normal, exact distance."""
    A = _side(ShapeType.CYLINDER, CYL, (0, 1.005, 0))
    B = _side(ShapeType.CYLINDER, CYL, (0, 0, 0))
    res = collide_support(A, B, THRESH)
    pts = _pts(res)
    assert len(pts) >= 2
    ds = [float(res.distance[0, i]) for i in pts]
    # deepest point exact; tilted patch samples carry r*(1-cos TILT) = 1e-4
    assert abs(min(ds) - 0.005) < 1e-5
    for d in ds:
        assert abs(d - 0.005) < 3e-4
    n = np.asarray(res.normal[0, pts[0]])
    np.testing.assert_allclose(n, [0, 1, 0], atol=1e-5)
    # the two contact points should span the overlap along x
    xs = sorted(float(res.pivot_a[0, i][0]) for i in pts[:2])
    assert xs[0] < -0.9 and xs[1] > 0.9


def test_rim_on_box_face():
    """Tilted cylinder rim touching a box top face: 1 point on the rim,
    normal = face normal, exact rim-point distance."""
    # box top face at y=0; cylinder tilted 30deg about z, cap rim lowest point
    box = (1.0, 0.5, 1.0)
    orn = _rot([0, 0, 1], 30)
    # rim lowest point for tilt t: center_y - hl*sin(t) - r*cos(t)
    t = np.deg2rad(30)
    drop = 1.0 * np.sin(t) + 0.5 * np.cos(t)
    cy = drop + 0.003
    A = _side(ShapeType.CYLINDER, CYL, (0, cy, 0), orn)
    B = _side(ShapeType.BOX, box, (0, -0.5, 0))
    res = collide_support(A, B, THRESH)
    pts = _pts(res)
    assert len(pts) >= 1
    i0 = pts[int(np.argmin([float(res.distance[0, i]) for i in pts]))]
    assert abs(float(res.distance[0, i0]) - 0.003) < 5e-4
    n = np.asarray(res.normal[0, i0])
    np.testing.assert_allclose(n, [0, 1, 0], atol=1e-3)
    # the pivot must be ON the rim: in object space, |pivot - cap_center|
    # perpendicular to axis == r, along axis == +-hl
    pa = np.asarray(res.pivot_a[0, i0])
    assert abs(abs(pa[0]) - 1.0) < 1e-3
    assert abs(np.hypot(pa[1], pa[2]) - 0.5) < 1e-3


def test_rim_on_box_edge_refined_axis():
    """Cylinder cap rim resting against a box EDGE — the contact normal comes
    from the circle-segment closest-point refinement (_rim_axes), not any
    face/edge-cross axis (reference: closest_point_circle_line,
    src/edyn/math/geom.cpp:217). Exact distance 0.01281, normal
    (0.781, 0.625, 0) — a pure +x face axis would report 0.010."""
    box = (1.0, 1.0, 1.0)
    # box at (0,-1,0): top edge along z at (x=1, y=0). Cylinder axis x,
    # center so the -x cap rim's lowest point sits at (1.01, 0.008, 0).
    A = _side(ShapeType.CYLINDER, CYL, (2.01, 0.508, 0.0))
    B = _side(ShapeType.BOX, box, (0, -1.0, 0))
    res = collide_support(A, B, THRESH)
    pts = _pts(res)
    assert len(pts) >= 1
    i0 = pts[int(np.argmin([float(res.distance[0, i]) for i in pts]))]
    n = np.asarray(res.normal[0, i0])
    assert n[1] > 0.5, f"edge-contact normal not refined: {n}"
    d = float(res.distance[0, i0])
    assert abs(d - 0.012806) < 1.5e-3


def test_cylinder_box_side_on_face():
    """Cylinder lying on a box face: 2-point line contact, exact distance."""
    A = _side(ShapeType.CYLINDER, CYL, (0, 0.502, 0))
    B = _side(ShapeType.BOX, (2.0, 0.0, 2.0), (0, 0, 0))
    # degenerate-thickness box is odd; use a real box below the cylinder
    B = _side(ShapeType.BOX, (2.0, 0.5, 2.0), (0, -0.5, 0))
    res = collide_support(A, B, THRESH)
    pts = _pts(res)
    assert len(pts) >= 2
    for i in pts:
        assert abs(float(res.distance[0, i]) - 0.002) < 1e-4
        n = np.asarray(res.normal[0, i])
        np.testing.assert_allclose(n, [0, 1, 0], atol=1e-5)


def test_rim_rim_crossed_cylinders():
    """Two crossed cylinders touching rim-to-rim: normal from the
    circle-circle refinement; distance matches brute force."""
    # B along x at origin; A along z, raised and shifted so cap rims approach
    A_orn = _rot([0, 1, 0], 90)  # x-axis body rotated to z
    apos = (1.35, 0.72, 1.35)
    A = _side(ShapeType.CYLINDER, CYL, apos, A_orn)
    B = _side(ShapeType.CYLINDER, CYL, (0, 0, 0))
    res = collide_support(A, B, THRESH)
    # brute force TRUE cylinder-cylinder distance: dense-sample A's surface,
    # measure point-to-cylinder distance to B analytically
    ang = np.linspace(0, 2 * np.pi, 720, endpoint=False)
    ts = np.linspace(-1.0, 1.0, 161)
    capA_lo = np.array(apos) - np.array([0, 0, 1.0])
    capA_hi = np.array(apos) + np.array([0, 0, 1.0])
    side = np.concatenate([
        np.stack([apos[0] + 0.5 * np.cos(a) * np.ones_like(ts),
                  apos[1] + 0.5 * np.sin(a) * np.ones_like(ts),
                  apos[2] + ts], 1) for a in ang[::4]])
    rr = np.linspace(0, 0.5, 41)
    caps = np.concatenate([
        np.stack([c[0] + r * np.cos(ang), c[1] + r * np.sin(ang),
                  np.full_like(ang, c[2])], 1)
        for c in (capA_lo, capA_hi) for r in rr])
    ptsA = np.concatenate([side, caps])
    # distance from points to B (axis x, |x|<=1, r=0.5)
    r_yz = np.hypot(ptsA[:, 1], ptsA[:, 2])
    dx = np.maximum(np.abs(ptsA[:, 0]) - 1.0, 0.0)
    dr = np.maximum(r_yz - 0.5, 0.0)
    inside_r = r_yz <= 0.5
    dist = np.where(inside_r, dx, np.sqrt(dx ** 2 + dr ** 2))
    exact = dist.min()
    assert exact < THRESH, "test geometry drifted out of contact range"
    pts = _pts(res)
    assert len(pts) >= 1
    i0 = pts[int(np.argmin([float(res.distance[0, i]) for i in pts]))]
    assert abs(float(res.distance[0, i0]) - exact) < 2.5e-3


def test_rolling_cylinder_down_slope_smooth():
    """A cylinder rolling down a tilted box face must roll smoothly — no
    12-gon facet chatter: angular velocity about the roll axis stays
    monotonic-ish and the body never bounces (vy stays small)."""
    import edyn_tpu as et

    b = et.WorldBuilder()
    slope_deg = 10.0
    orn = _rot([0, 0, 1], slope_deg)
    b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.BoxShape((20.0, 0.5, 4.0)),
        position=(0, 0, 0), orientation=orn,
        material=et.Material(friction=0.8, restitution=0.0)))
    t = np.deg2rad(slope_deg)
    up = np.array([-np.sin(t), np.cos(t), 0.0])
    start = up * (0.5 + 0.5) + np.array([0, 0.002, 0])
    cyl = b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.CylinderShape(0.5, 0.75, axis=2),
        position=tuple(start),
        material=et.Material(friction=0.8, restitution=0.0)))
    w = et.make_world(b, et.Settings())
    offslope = []
    wzs = []
    vxs = []
    for _ in range(120):
        w.step(1)
        v = np.array([float(w.linvel(cyl)[i]) for i in range(3)])
        offslope.append(abs(float(v @ up)))   # velocity normal to the slope
        wzs.append(float(w.angvel(cyl)[2]))
        vxs.append(v[0])
    # rolling down the slope: velocity stays slope-parallel (no facet
    # chatter — the 12-gon produced periodic normal-velocity spikes), spin
    # grows, and |v| ~= omega*r (rolling without slipping)
    assert max(offslope[10:]) < 0.05, f"bouncing: {max(offslope[10:])}"
    assert abs(wzs[-1]) > 0.8, f"not rolling: {wzs[-20:]}"
    speed = abs(vxs[-1]) / np.cos(t)
    assert abs(speed - abs(wzs[-1]) * 0.5) < 0.05, "slipping, not rolling"
    # acceleration matches the analytic rolling solution a = (2/3) g sin(t)
    a = speed / 2.0  # 120 steps at 1/60 s
    assert abs(a - (2.0 / 3.0) * 9.8 * np.sin(t)) < 0.12, a
