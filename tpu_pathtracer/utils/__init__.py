"""Utility helpers: orbit camera controller, misc."""

from .orbit import OrbitCamera
from .debug import assert_finite_render, checked_render_frame

__all__ = ["OrbitCamera", "assert_finite_render", "checked_render_frame"]
