"""Double-precision path (reference: EDYN_DOUBLE_PRECISION,
include/edyn/math/scalar.hpp:9-15).

The JAX-native switch is ``jax_enable_x64`` + ``config.scalar_dtype()``: set
the flag before building a world and every state leaf, spawn write, and step
output is float64. x64 is process-global in JAX, so the scenario runs in a
subprocess (the rest of the suite stays f32)."""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCENARIO = textwrap.dedent("""
    import os
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import edyn_tpu as et

    b = et.WorldBuilder()
    ground = b.make_rigidbody(et.RigidBodyDef(
        kind=et.KIND_STATIC, shape=et.PlaneShape((0, 1, 0), 0),
        material=et.Material(friction=0.8)))
    stack = [b.make_rigidbody(et.RigidBodyDef(
        mass=1.0, shape=et.BoxShape((0.5, 0.5, 0.5)),
        position=(0.0, 0.55 + 1.08 * k, 0.0),
        material=et.Material(friction=0.8, restitution=0.0)))
        for k in range(4)]
    w = et.make_world(b)

    # dtype propagation: construction
    for name in ("pos", "orn", "linvel", "angvel", "mass_inv", "inertia_inv"):
        dt = getattr(w.state, name).dtype
        assert dt == np.float64, (name, dt)

    # dtype propagation: the step itself (a single f32 leak inside the step
    # would surface here as a float32 output leaf or a scan carry mismatch)
    w.step(30)
    w.block_until_ready()
    assert w.state.pos.dtype == np.float64, w.state.pos.dtype

    # mutators keep the dtype
    w.set_position(stack[0], np.asarray(w.position(stack[0])))
    w.apply_impulse(stack[0], (0.0, 0.0, 0.0))
    assert w.state.pos.dtype == np.float64
    assert w.state.linvel.dtype == np.float64

    # stability: the 4-box stack stays standing at double precision
    w.step(60)
    w.block_until_ready()
    pos = np.asarray(w.state.pos)
    for k, e in enumerate(stack):
        y = pos[e][1]
        assert abs(y - (0.5 + 1.0 * k)) < 0.2, (k, y)
    # on-device multi-step loop carries the f64 pytree through lax.scan
    w.step_n(5)
    w.block_until_ready()
    assert w.state.pos.dtype == np.float64
    print("X64_OK")
""")


def test_double_precision_world():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    out = subprocess.run([sys.executable, "-c", SCENARIO], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    assert "X64_OK" in out.stdout
