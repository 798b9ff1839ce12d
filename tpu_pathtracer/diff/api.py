"""Differentiable rendering API: losses and gradients w.r.t. scene/camera.

Net-new capability vs the reference (which is forward-only; BASELINE.json
north star).  Mechanics: the trace runs with `differentiable=True`
(ops/trace.trace_rays), i.e. the BVH walk is detached and intersection math
is replayed analytically — path-replay backprop with discrete decisions
(specular-vs-diffuse Bernoulli, raytrace.wgsl:386-388; visibility) treated as
locally constant.  RNG streams are identical between forward and replay by
construction because the trace is one pure function.

Differentiable leaves: every float field of Materials, `env.radiance`, the
Camera fields, env_intensity/env_rotation, and packed vertex data.  Integer
fields (BVH topology, material indices) receive zero cotangents.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from ..ops.trace import render_frame
from ..scene.types import RenderParams, SceneData


def render_frame_diff(scene, params, *, width: int, height: int, aspect: float,
                      samples_per_frame: int = 1, max_bounces: int = 4,
                      env_importance: bool = False):
    """`ops.trace.render_frame` with the differentiable intersect path."""
    return render_frame(
        scene, params, width=width, height=height, aspect=aspect,
        samples_per_frame=samples_per_frame, max_bounces=max_bounces,
        env_importance=env_importance, differentiable=True,
    )


def l2_image_loss(img, target):
    return 0.5 * jnp.mean((img - target) ** 2)


def make_loss(target, *, width: int, height: int, aspect: float,
              samples_per_frame: int = 1, max_bounces: int = 4,
              loss_fn: Callable = l2_image_loss):
    """loss(scene, params) -> scalar, differentiable w.r.t. both pytrees."""

    def loss(scene: SceneData, params: RenderParams):
        img = render_frame_diff(
            scene, params, width=width, height=height, aspect=aspect,
            samples_per_frame=samples_per_frame, max_bounces=max_bounces,
        )
        return loss_fn(img, target)

    return loss


def grads(loss, scene, params):
    """(d loss/d scene, d loss/d params); integer leaves get float0 zeros."""
    return jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, params)


# --------------------------------------------------------------------------
# Named-leaf optimization helpers: optimize a flat {name: array} dict of
# scene/param leaves (e.g. "materials.color", "env.radiance",
# "camera.position") without dragging integer topology through the optimizer.
# --------------------------------------------------------------------------


def get_leaf(obj, path: str):
    for part in path.split("."):
        obj = getattr(obj, part)
    return obj


def set_leaf(obj, path: str, value):
    """Functional deep-replace along a dataclass attribute path."""
    parts = path.split(".")
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: value})
    child = getattr(obj, parts[0])
    return dataclasses.replace(
        obj, **{parts[0]: set_leaf(child, ".".join(parts[1:]), value)}
    )


_PARAM_PATHS = ("camera", "env_intensity", "env_rotation", "frame")


def _is_param_path(path: str) -> bool:
    return path.split(".")[0] in _PARAM_PATHS


def extract(scene: SceneData, params: RenderParams, paths: Iterable[str]) -> dict:
    """Pull the named leaves into a flat optimizable dict."""
    out = {}
    for p in paths:
        src = params if _is_param_path(p) else scene
        out[p] = get_leaf(src, p)
    return out


def insert(scene: SceneData, params: RenderParams, values: dict):
    """Write a flat dict of leaves back into (scene, params)."""
    for p, v in values.items():
        if _is_param_path(p):
            params = set_leaf(params, p, v)
        else:
            scene = set_leaf(scene, p, v)
    return scene, params


def make_param_loss(loss, scene: SceneData, params: RenderParams,
                    paths: Iterable[str]):
    """Close `loss(scene, params)` over everything except the named leaves:
    returns loss_p(values_dict) suitable for jax.value_and_grad / optax."""
    paths = tuple(paths)

    def loss_p(values: dict):
        s, p = insert(scene, params, values)
        return loss(s, p)

    return loss_p
