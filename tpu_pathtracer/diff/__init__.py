"""Differentiable rendering (path-replay backprop) + inverse rendering.

Net-new vs the forward-only reference; see BASELINE.json north star and
SURVEY.md §7 layer E.
"""

from .api import (
    extract,
    grads,
    insert,
    l2_image_loss,
    make_loss,
    make_param_loss,
    render_frame_diff,
)
from .invert import InvertResult, invert

__all__ = [
    "InvertResult",
    "extract",
    "grads",
    "insert",
    "invert",
    "l2_image_loss",
    "make_loss",
    "make_param_loss",
    "render_frame_diff",
]
