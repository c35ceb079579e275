"""Engine constants and runtime settings.

Mirrors the reference's three config tiers (SURVEY §5.6):
- hard constants (reference: include/edyn/config/constants.hpp:9-80)
- runtime ``settings`` (reference: include/edyn/context/settings.hpp:21-58)

``Settings`` is a frozen dataclass so it hashes and can be passed as a static
argument to jit — changing a setting triggers a re-trace, which is the JAX
analogue of the reference's ``refresh_settings`` re-broadcast
(src/edyn/edyn.cpp:199-231).
"""
from __future__ import annotations

import dataclasses
import math

# --- hard constants (reference: include/edyn/config/constants.hpp) ---
MAX_CONTACTS = 4
COLLISION_THRESHOLD = 0.01
CONTACT_BREAKING_THRESHOLD = 0.02
CONTACT_MERGING_THRESHOLD = 0.01
CONTACT_CACHING_THRESHOLD = 0.04
ISLAND_LINEAR_SLEEP_THRESHOLD = 0.005
ISLAND_ANGULAR_SLEEP_THRESHOLD = math.pi / 48.0
ISLAND_TIME_TO_SLEEP = 2.0
SUPPORT_FEATURE_TOLERANCE = 0.005
CONTACT_POSITION_CORRECTION_RATE = 0.2
CONTACT_POSITION_SOLVER_MIN_ERROR = -0.005
CONVEX_MESH_RELEVANT_DIRECTION_TOLERANCE = 0.0006
# Per-body slack of the carried ("fat") broadphase AABB. The reference's
# dynamic tree stores AABBs inflated by 0.1 and only re-seats them when the
# tight AABB escapes (dynamic_tree.hpp:24 aabb_inset, dynamic_tree.cpp:60-77
# move), which keeps the pair set FIXED under sub-margin jitter — the
# property that lets settling piles reach sleep (a flickering AABB pair
# would destroy/recreate its manifold and wake the island every step).
# 0.04 per body gives ~0.08 pairing slack between two fat boxes — escape
# slack is ~4x the drift a quiet island can accumulate over its whole 2 s
# sleep window, while keeping the candidate-pair inflation modest (the
# reference's tree-fat reach is 0.1 but its manifold lifetime is decided on
# tight AABBs; ours rides the candidate list, so the margin directly sets
# slot pressure).
BROADPHASE_FAT_MARGIN = 0.04  # legacy (checkpoint v4 carried fat boxes)
# Pair admission: a pair occupies a manifold slot only while the bodies'
# swept tight AABBs, each inflated by this margin, overlap. The COMBINED
# gap (2x this) equals the reference's manifold-destruction threshold
# (broadphase.hpp m_separation_threshold = 1.3 * contact_breaking): both
# designs keep manifolds alive out to ~0.026 of separation, beyond which
# no contact point can exist (points break at contact_breaking = 0.02).
# Measured: every narrowphase/carry/solver width scales with the pair
# count this margin admits (~8/body settled at 0.013/side vs ~10 at
# 0.026/side on the 2k mixed pile).
PAIR_SEPARATION_MARGIN = 0.65 * CONTACT_BREAKING_THRESHOLD

GRAVITY_EARTH = (0.0, -9.8, 0.0)  # reference: include/edyn/math/constants.hpp
LARGE_SCALAR = 1e9  # stiffness above this => rigid contact


def scalar_dtype():
    """The engine's scalar dtype — the JAX-native analogue of the reference's
    EDYN_DOUBLE_PRECISION compile switch (include/edyn/math/scalar.hpp:9-15):
    float64 when ``jax_enable_x64`` is set (set it BEFORE building a world),
    float32 otherwise. State construction and host->device casts route
    through this so one flag flips the whole pipeline."""
    import jax

    import numpy as np
    return np.float64 if jax.config.jax_enable_x64 else np.float32


@dataclasses.dataclass(frozen=True)
class Settings:
    """Runtime settings (reference: include/edyn/context/settings.hpp:21-58).

    Fields that were function pointers in the reference (task hooks,
    should_collide, time source) are either structural here (XLA schedules the
    step) or provided as world-level callables outside the jitted region.
    """
    fixed_dt: float = 1.0 / 60.0
    gravity: tuple = GRAVITY_EARTH
    max_steps_per_update: int = 10
    num_solver_velocity_iterations: int = 8
    num_solver_position_iterations: int = 3
    num_restitution_iterations: int = 8
    num_individual_restitution_iterations: int = 3
    paused: bool = False
    # TPU-solver specifics (no reference equivalent): batched-impulse
    # relaxation. The reference solves rows strictly sequentially per island
    # (src/edyn/dynamics/island_solver.cpp:94-111); the batched solver applies
    # all row impulses concurrently, so impulses into shared bodies are scaled
    # by the body's constraint degree (mass-splitting) for convergence.
    mass_splitting: bool = True
    # Sleeping (mask-based; reference uses sleeping_tag entities).
    enable_sleeping: bool = True
    # Speculative contact distance (narrowphase emits contacts up to this
    # separation; reference: collision_threshold).
    collision_threshold: float = COLLISION_THRESHOLD

    def replace(self, **kw) -> "Settings":
        return dataclasses.replace(self, **kw)
