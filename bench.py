"""Headline benchmark: ray-vs-scene intersection throughput on the default
backend, measured honestly.

One "ray" = one ray-vs-scene intersection (W*H pixels x spp x max_bounces
intersections per frame).  Prints ONE JSON line
{"metric","value","unit","vs_baseline"} with vs_baseline relative to the
1e9 rays/s/chip target (BASELINE.json).

The headline shape is PINNED across rounds to the reference's default
dispatch shape — 512x512 x 1 spp x 4 bounces on the default scene
(reference: src/renderer.ts:39-41 at a 2048-wide canvas -> 512^2 internal;
src/passes/raytrace.ts:697-698) — so round-over-round numbers are
comparable.  The frame count is auto-scaled so each timed program runs
~1.5 s; throughput is the SLOPE between two budget sizes with a linearity
gate, a profiler device-time cross-check, and a physical-bounds check
(see tpu_pathtracer/render/benchmark.py for the methodology and why
best-of-N wall timing was abandoned: round-1 numbers were relay dispatch
artifacts, not kernel time).

`python bench.py --full` additionally reports the BASELINE.json config
sweep (Cornell-class 256^2, 1K-tri mesh + DoF 512^2, env-lit 1080p with
denoise+tonemap, 100K-tri stress) and the virtual-mesh scaling table to
stderr.
"""

from __future__ import annotations

import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def headline(reps=3, deadline=None):
    import jax

    import tpu_pathtracer as pt
    from tpu_pathtracer.render.benchmark import bench_config
    from tpu_pathtracer.scene.envmap import gradient_sky
    from tpu_pathtracer.scene.types import Camera

    W = H = 512
    SPP, BOUNCES = 1, 4
    scene = pt.default_scene(gradient_sky(64, 128))
    data = jax.device_put(scene.compile())
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    res = bench_config(
        data, cam, width=W, height=H, spp=SPP, bounces=BOUNCES, aspect=1.0,
        reps=reps, deadline=deadline, log=log,
    )
    log(
        f"headline 512^2x1sppx4b: {res.rays_per_s:.3e} rays/s  "
        f"{W * H * SPP / res.per_frame_s / 1e6:.1f} Mpaths/s  "
        f"per-frame {res.per_frame_s*1e3:.2f} ms (slope; "
        f"T({res.n1})={res.t_n1_s:.2f}s T({res.n2})={res.t_n2_s:.2f}s, "
        f"spread {res.spread_rel*100:.0f}%, linearity {res.linearity:.2f}, "
        f"device {None if res.device_per_frame_s is None else f'{res.device_per_frame_s*1e3:.2f}'} ms/frame, "
        f"compile {res.compile_s:.0f}s)  ok={res.ok} {res.reasons}"
    )
    return res


def full_sweep():
    import math
    import time

    import jax
    import numpy as np

    import tpu_pathtracer as pt
    from tpu_pathtracer.render.benchmark import bench_config
    from tpu_pathtracer.scene import primitives
    from tpu_pathtracer.scene.envmap import gradient_sky
    from tpu_pathtracer.scene.host import Material, Mesh, Scene, rotation_x
    from tpu_pathtracer.scene.types import Camera

    sky = gradient_sky(512, 1024)
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    dof_cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45,
                            focal_distance=4.0, aperture=0.1)

    def mesh_scene(segments):
        s = Scene()
        s.add(Mesh(*primitives.sphere(0.5, segments, segments // 2),
                   Material(color=(0.8, 0.7, 0.6))))
        s.add(Mesh(*primitives.plane(4, 4), Material(),
                   transform=rotation_x(-math.pi / 2)))
        s.set_environment(sky)
        return s

    configs = [
        ("cornell_256", pt.default_scene(sky), cam, 256, 1, 4),
        ("mesh1K_dof_512", mesh_scene(32), dof_cam, 512, 1, 4),
        ("envlit_1080p", mesh_scene(32), cam, 1024, 1, 4),
        ("stress100K_512", mesh_scene(320), cam, 512, 1, 6),
    ]
    sweep = {}
    for name, scene, c, size, spp, bounces in configs:
        data = jax.device_put(scene.compile())
        res = bench_config(data, c, width=size, height=size, spp=spp,
                           bounces=bounces, reps=3, log=log)
        mpaths = size * size * spp / res.per_frame_s / 1e6
        log(f"{name}: {res.rays_per_s:.3e} rays/s  {mpaths:.1f} Mpaths/s  "
            f"ok={res.ok} {res.reasons}")
        sweep[name] = {
            "rays_per_s": res.rays_per_s,
            "per_frame_ms": res.per_frame_s * 1e3,
            "paths_per_s": size * size * spp / res.per_frame_s,
            "linearity": res.linearity,
            "ok": res.ok,
        }
    with open("BENCH_SWEEP.json", "w") as f:
        json.dump(sweep, f, indent=1)
    log("sweep recorded to BENCH_SWEEP.json")

    # denoise+tonemap post at 1080p (fullscreen-pass equivalent), slope-timed
    import jax.numpy as jnp

    from tpu_pathtracer.config import PostConfig
    from tpu_pathtracer.post import postprocess

    img = jnp.asarray(np.random.default_rng(0).random((1080, 1920, 3)),
                      jnp.float32)
    post = PostConfig(denoise=True)

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def post_n(img, n):
        def body(i, x):
            return postprocess(x * (1.0 / (1.0 + i)), post)
        return jax.lax.fori_loop(0, n, body, img)

    def timed(n):
        np.asarray(post_n(img, n))
        t0 = time.perf_counter()
        np.asarray(post_n(img, n))
        return time.perf_counter() - t0

    t8, t16 = timed(8), timed(16)
    log(f"post_1080p (denoise+aces): {(t16-t8)/8*1e3:.2f} ms/frame (slope; T8={t8:.2f}s T16={t16:.2f}s)")

    # mesh-size scaling table (VERDICT r1 item 4): per-device step time at
    # tiles=1,2,4,8 over however many devices this run has
    from tpu_pathtracer.render.benchmark import bench_scaling

    scene = pt.default_scene(gradient_sky(64, 128))
    bench_scaling(jax.device_put(scene.compile()), cam, width=256, height=256,
                  spp=1, bounces=4, log=log)


def main() -> None:
    """Headline FIRST, JSON line emitted the moment it exists, extras after.

    Round-3 ordering (sweep before headline, JSON only at the very end)
    meant a single slow compile starved the driver artifact (BENCH_r03
    rc=124, parsed=null).  Now the ONE consumable JSON line is printed as
    soon as the headline measurement lands; `--full` extras run afterwards
    and can be killed without losing the record."""
    import os
    import time

    import jax

    from tpu_pathtracer.utils.compcache import enable_compilation_cache

    t_start = time.perf_counter()
    deadline = t_start + float(os.environ.get("TPT_BENCH_DEADLINE_S", "900"))
    cache_dir = enable_compilation_cache()
    log(f"compilation cache: {cache_dir}")
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    res = headline(deadline=deadline)
    from tpu_pathtracer.render.benchmark import headline_record

    paths_per_s = 512 * 512 * 1 / res.per_frame_s
    rec = headline_record(res, backend, paths_per_s)
    if os.path.exists("BENCH_SWEEP.json"):
        # attach the most recent config sweep (written by `bench.py --full`)
        with open("BENCH_SWEEP.json") as f:
            rec["sweep"] = json.load(f)
    print(json.dumps(rec), flush=True)
    if "--full" in sys.argv:
        full_sweep()


if __name__ == "__main__":
    main()
