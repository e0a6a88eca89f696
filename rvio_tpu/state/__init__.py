"""Fixed-shape robocentric filter state and its window operations."""

from rvio_tpu.state.filter_state import (
    FilterState,
    StateIndex,
    make_initial_state,
    static_initialize,
)
from rvio_tpu.state.window import augment_window, compose_state

__all__ = [
    "FilterState", "StateIndex", "make_initial_state", "static_initialize",
    "augment_window", "compose_state",
]
