"""Dump the top device ops of the headline frame budget (dev tool).

Runs the pinned headline shape (512^2 x 1spp x 4 bounces, default scene)
under jax.profiler and prints every device-side span >= 0.5% of total,
so kernel/sort/gather/fusion costs are visible individually.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

import tpu_pathtracer as pt
from tpu_pathtracer.render.benchmark import make_budget
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.types import Camera, RenderParams
from tpu_pathtracer.utils.compcache import enable_compilation_cache
from tpu_pathtracer.utils.devtime import device_time

enable_compilation_cache()

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 20

scene = pt.default_scene(gradient_sky(64, 128))
scene_d = jax.device_put(scene.compile())
cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
params = RenderParams.create(cam, frame=1)
budget = make_budget(512, 512, 1, 4, 1.0)
np.asarray(budget(scene_d, params, N_FRAMES))  # compile+warm

dt = device_time(lambda: budget(scene_d, params, N_FRAMES))
total = sum(v for k, v in dt["programs"].items() if "jit_" in k)
print(f"total jit device time: {total*1e3:.2f} ms over {N_FRAMES} frames "
      f"= {total/N_FRAMES*1e3:.3f} ms/frame")
rows = sorted(dt["programs"].items(), key=lambda kv: -kv[1])
for name, dur in rows:
    if "jit_" in name:
        continue  # the top-level program span double-counts its ops
    if dur < total * 0.005:
        continue
    print(f"{dur/N_FRAMES*1e3:9.4f} ms/frame  {dur/total*100:5.1f}%  {name[:120]}")
