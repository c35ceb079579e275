"""Timestamped input history for extrapolation replay (reference:
include/edyn/networking/util/input_state_history.hpp:19-232 and
action_history, Design.md:367-379)."""
from __future__ import annotations

import bisect
import dataclasses
from typing import Callable, List, Tuple


@dataclasses.dataclass
class InputHistory:
    """Ring of (timestamp, apply_fn) entries; apply_fn(state) -> state writes
    the input components (e.g. a vehicle's steering column) into the state.
    During extrapolation, each step applies every entry that falls inside its
    time window (reference: input_state_history_reader::import_each)."""
    window: float = 2.0
    entries: List[Tuple[float, Callable]] = dataclasses.field(default_factory=list)

    def record(self, timestamp: float, apply_fn: Callable):
        bisect.insort(self.entries, (timestamp, apply_fn), key=lambda e: e[0])
        cutoff = timestamp - self.window
        while self.entries and self.entries[0][0] < cutoff:
            self.entries.pop(0)

    def apply(self, state, t: float, dt: float):
        lo = bisect.bisect_left(self.entries, t, key=lambda e: e[0])
        hi = bisect.bisect_left(self.entries, t + dt, key=lambda e: e[0])
        for _, fn in self.entries[lo:hi]:
            state = fn(state)
        return state

    def merge_remote(self, other: "InputHistory"):
        """Server-side merge of client-sent histories (reference:
        action_history merged server-side)."""
        for e in other.entries:
            self.record(*e)
