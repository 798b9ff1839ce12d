"""Utility helpers: orbit camera controller, misc."""

from .orbit import OrbitCamera

__all__ = ["OrbitCamera"]
