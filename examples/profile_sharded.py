"""Diagnose the sharded program's on-chip cost vs unsharded (dev tool).

Round-4 finding: the sharded whole-budget program compiles >20 min and ran
~2.9x the unsharded per-frame cost at tiles=1 on the real chip.  This tool
compiles the sharded FRAME STEP (tiles=1 mesh) at a given size, times its
compile, and prints its per-op device profile next to the unsharded
frame's, so the extra cost is named rather than guessed.

Usage: python examples/profile_sharded.py [size] [bounces] [n_frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import tpu_pathtracer as pt
from tpu_pathtracer.parallel import sharded
from tpu_pathtracer.parallel.mesh import make_mesh
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.types import Camera, RenderParams
from tpu_pathtracer.utils.compcache import enable_compilation_cache
from tpu_pathtracer.utils.devtime import device_time

enable_compilation_cache()

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BOUNCES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20

scene = pt.default_scene(gradient_sky(64, 128))
scene_d = jax.device_put(scene.compile())
cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
params = RenderParams.create(cam, frame=1)


def report(tag, fn_once):
    t0 = time.perf_counter()
    np.asarray(fn_once())
    compile_s = time.perf_counter() - t0
    np.asarray(fn_once())

    def run_n():
        out = None
        for _ in range(N):
            out = fn_once()
        return out

    dt = device_time(run_n)
    total = sum(v for k, v in dt["programs"].items() if "jit_" in k)
    print(f"--- {tag}: compile {compile_s:.1f}s, device "
          f"{total / N * 1e3:.3f} ms/frame", flush=True)
    rows = sorted(dt["programs"].items(), key=lambda kv: -kv[1])
    for name, dur in rows:
        if "jit_" in name or dur < total * 0.01:
            continue
        print(f"{dur/N*1e3:9.4f} ms/frame {dur/total*100:5.1f}%  {name[:110]}")


# unsharded frame step
from tpu_pathtracer.ops.trace import accumulate, render_frame


@jax.jit
def frame_unsharded(scene, params, acc):
    img = render_frame(scene, params, width=SIZE, height=SIZE, aspect=1.0,
                       samples_per_frame=1, max_bounces=BOUNCES)
    return accumulate(acc, img, params.frame, enabled=True)


acc0 = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
report("unsharded frame", lambda: frame_unsharded(scene_d, params, acc0))

# sharded frame step, tiles=1
mesh = make_mesh(tiles=1, samples=1)
step = sharded.make_sharded_frame_step(
    mesh, width=SIZE, height=SIZE, aspect=1.0, samples_per_frame=1,
    max_bounces=BOUNCES)
acc_s = sharded.zeros_acc(mesh, SIZE, SIZE)


def sharded_once():
    # non-donated copy so the same acc can be reused across reps
    return step(scene_d, params, jnp.copy(acc_s))


report("sharded tiles=1 frame", sharded_once)
