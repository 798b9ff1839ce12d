"""Numerical sanitizers: checkify-instrumented rendering.

The reference relies on WebGPU's validation layer and structural hazard
avoidance (SURVEY §5 'race detection / sanitizers'); the JAX analogue of the
remaining hazard class (NaN/Inf propagation, out-of-bounds gathers) is
`jax.experimental.checkify`: `checked_render_frame` runs the full trace with
float and index checks and returns the first error alongside the image.

Use in tests and debugging sessions — the instrumented program is slower
and should not ship in the hot path.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.experimental import checkify

from ..ops.trace import render_frame


def checked_render_frame(scene, params, *, width: int, height: int,
                         aspect: float, samples_per_frame: int = 1,
                         max_bounces: int = 4, env_importance: bool = False,
                         errors=None):
    """render_frame under checkify float/index checks.

    Returns (error, image); `error.throw()` raises if any check fired,
    `error.get()` returns the message or None.
    """
    if errors is None:
        errors = checkify.float_checks | checkify.index_checks

    f = partial(
        render_frame,
        width=width, height=height, aspect=aspect,
        samples_per_frame=samples_per_frame, max_bounces=max_bounces,
        env_importance=env_importance,
    )
    checked = checkify.checkify(f, errors=errors)
    return jax.jit(checked)(scene, params)


def assert_finite_render(scene, params, **kw) -> None:
    """Raise if the render produces NaN/Inf or out-of-bounds indexing."""
    err, _ = checked_render_frame(scene, params, **kw)
    err.throw()
