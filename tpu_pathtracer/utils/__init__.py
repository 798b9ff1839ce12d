"""Utility helpers: orbit camera controller, misc."""

from .orbit import OrbitCamera
from .bluenoise import blue_noise
from .debug import assert_finite_render, checked_render_frame

__all__ = ["OrbitCamera", "assert_finite_render", "blue_noise", "checked_render_frame"]
