"""Inverse rendering: recover scene/camera parameters from a target image by
gradient descent on the differentiable render (BASELINE.json configs[4]).

The reference has no analogue — this is a net-new north-star capability.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List

import jax
import jax.numpy as jnp
import optax

from ..scene.types import RenderParams, SceneData
from . import api


@dataclass
class InvertResult:
    values: Dict[str, jax.Array]
    losses: List[float] = field(default_factory=list)

    @property
    def final_loss(self) -> float:
        return self.losses[-1]


def invert(
    scene: SceneData,
    params: RenderParams,
    target,
    paths: Iterable[str],
    *,
    width: int,
    height: int,
    aspect: float,
    samples_per_frame: int = 1,
    max_bounces: int = 2,
    steps: int = 100,
    learning_rate: float = 5e-2,
    optimizer=None,
) -> InvertResult:
    """Gradient-descent recovery of the named leaves (e.g. 'materials.color',
    'env.radiance', 'camera.position') from `target` (H, W, 3).

    The per-frame RNG stream is fixed by `params.frame`, so the loss is
    deterministic and finite-difference-checkable; pass a fresh frame per
    step for stochastic gradient averaging if desired.
    """
    loss = api.make_loss(
        target, width=width, height=height, aspect=aspect,
        samples_per_frame=samples_per_frame, max_bounces=max_bounces,
    )
    loss_p = api.make_param_loss(loss, scene, params, paths)
    values = api.extract(scene, params, paths)

    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    opt_state = opt.init(values)

    @jax.jit
    def step(values, opt_state):
        l, g = jax.value_and_grad(loss_p)(values)
        updates, opt_state = opt.update(g, opt_state, values)
        return optax.apply_updates(values, updates), opt_state, l

    losses = []
    for _ in range(steps):
        values, opt_state, l = step(values, opt_state)
        losses.append(float(l))
    return InvertResult(values=values, losses=losses)
