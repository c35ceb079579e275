"""Presentation interpolation & discontinuity smoothing.

Reference: sys/update_presentation.cpp:19-55 (present_position/orientation =
transform extrapolated to ``time - presentation_delay``, plus accumulated
network discontinuity offsets decayed per step) and the adaptive presentation
delay of the async stepper (stepper_async.cpp:240-277).
"""
from __future__ import annotations

import numpy as np

from ..math import quat

DISCONTINUITY_DECAY = 0.9  # per fixed step


class Presentation:
    """Host-side presentation state for rendering: smoothed transforms at an
    arbitrary render time between fixed steps."""

    def __init__(self, world, presentation_delay: float = 0.0):
        self.world = world
        self.presentation_delay = presentation_delay
        N = world.state.capacity
        self.disc_pos = np.zeros((N, 3), np.float32)
        self.disc_angle = np.zeros((N, 3), np.float32)  # axis*angle offsets

    def add_discontinuity(self, indices, dpos, dangle=None):
        """Accumulate offsets after a state snap (reference:
        networking/comp/discontinuity.hpp)."""
        self.disc_pos[indices] += dpos
        if dangle is not None:
            self.disc_angle[indices] += dangle

    def on_step(self):
        self.disc_pos *= DISCONTINUITY_DECAY
        self.disc_angle *= DISCONTINUITY_DECAY

    def transforms(self, render_time: float):
        """(positions [N,3], orientations [N,4]) at render_time: the fixed-step
        state extrapolated by velocity over the sub-step remainder, plus
        decaying discontinuity offsets."""
        st = self.world.state
        dt_frac = float(render_time - float(st.sim_time) - self.presentation_delay)
        dt_frac = np.clip(dt_frac, -1.0 / 30.0, 1.0 / 30.0)
        pos = np.asarray(st.pos) + np.asarray(st.linvel) * dt_frac + self.disc_pos
        orn = np.asarray(quat.integrate(st.orn, st.angvel, dt_frac))
        return pos, orn
