"""Headline benchmark: BVH-traversal ray throughput on the default backend.

Measures the fused progressive frame step (camera raygen -> stackless BVH
traversal + Moller-Trumbore -> shade -> accumulate) on the default-scene
geometry and reports rays/s, where one "ray" is one ray-vs-BVH traversal
(W*H pixels x spp x max_bounces traversals per frame; every bounce iteration
traverses the full BVH for the whole ray batch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 1e9 rays/s/chip target (BASELINE.json).
"""

from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    import tpu_pathtracer as pt
    from tpu_pathtracer.ops.trace import accumulate, render_frame
    from tpu_pathtracer.scene.envmap import gradient_sky

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    W = H = 512
    SPP = 1
    BOUNCES = 4
    FRAMES = 16  # timed frames per repetition

    scene = pt.default_scene(gradient_sky(64, 128))
    cam = pt.Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    scene_data = scene.compile()
    scene_data = jax.device_put(scene_data)

    def step(scene_d, params, acc):
        img = render_frame(
            scene_d, params, width=W, height=H, aspect=1.0,
            samples_per_frame=SPP, max_bounces=BOUNCES,
        )
        return accumulate(acc, img, params.frame, enabled=True)

    step = jax.jit(step, donate_argnums=(2,))

    def run_frames(n, acc, f0):
        for i in range(n):
            params = pt.RenderParams.create(cam, frame=f0 + i)
            acc = step(scene_data, params, acc)
        return jax.block_until_ready(acc)

    acc = jnp.zeros((H, W, 3), jnp.float32)
    t0 = time.perf_counter()
    acc = run_frames(2, acc, 1)  # compile + warm-up
    log(f"compile+warmup: {time.perf_counter() - t0:.1f}s")

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        acc = run_frames(FRAMES, acc, 3 + rep * FRAMES)
        dt = time.perf_counter() - t0
        log(f"rep {rep}: {dt*1e3:.1f} ms for {FRAMES} frames")
        best = min(best, dt)

    rays = W * H * SPP * BOUNCES * FRAMES
    rays_per_s = rays / best
    print(json.dumps({
        "metric": f"bvh_traversal_rays_per_s_{backend}",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / 1e9,
    }))


if __name__ == "__main__":
    main()
