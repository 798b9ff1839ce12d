"""Shared benchmark harness: the rays/s measurement used by both the
repo-root bench.py and `cli benchmark` (one definition of the headline
metric).

One "ray" = one ray-vs-BVH traversal: W*H pixels x spp x max_bounces
traversals per frame (every bounce iteration traverses the full BVH for the
whole batch).  Timing is best-of-N blocked wall time — this environment
reaches the TPU through a tunnel with occasional multi-second stalls, and
best-of filters them out.
"""

from __future__ import annotations

import time
from typing import Tuple


def make_step(width: int, height: int, spp: int, bounces: int, aspect=None):
    import jax

    from ..ops.trace import accumulate, render_frame

    aspect = aspect if aspect is not None else width / height

    def step(scene_d, params, acc):
        img = render_frame(scene_d, params, width=width, height=height,
                           aspect=aspect, samples_per_frame=spp,
                           max_bounces=bounces)
        return accumulate(acc, img, params.frame, enabled=True)

    return jax.jit(step, donate_argnums=(2,))


def bench_step(step, scene_data, cam, *, width: int, height: int, spp: int,
               bounces: int, frames: int = 16, reps: int = 5
               ) -> Tuple[float, float, float]:
    """Returns (rays_per_s, compile_seconds, best_seconds)."""
    import jax
    import jax.numpy as jnp

    from ..scene.types import RenderParams

    def run(n, acc, f0):
        for i in range(n):
            acc = step(scene_data, RenderParams.create(cam, frame=f0 + i), acc)
        return jax.block_until_ready(acc)

    acc = jnp.zeros((height, width, 3), jnp.float32)
    t0 = time.perf_counter()
    acc = run(2, acc, 1)  # compile + warm-up
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        acc = run(frames, acc, 3 + rep * frames)
        best = min(best, time.perf_counter() - t0)
    rays = width * height * spp * bounces * frames
    return rays / best, compile_s, best


def headline_record(rays_per_s: float, backend: str) -> dict:
    """The one-line JSON record the driver consumes (vs 1e9 rays/s/chip)."""
    return {
        "metric": f"bvh_traversal_rays_per_s_{backend}",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / 1e9,
    }
