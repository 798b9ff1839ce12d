"""Sweep an env-var experiment knob over headline-frame device time (dev tool).

Usage: python examples/sweep_knob.py KNOB v1 v2 v3 ...
Renders the pinned headline shape (512^2 x 1spp x 4 bounces) for each value
and prints profiler device ms/frame.
"""
import importlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

knob = sys.argv[1]
values = sys.argv[2:]

import jax
import numpy as np

import tpu_pathtracer as pt
from tpu_pathtracer.render.benchmark import make_budget
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.types import Camera, RenderParams
from tpu_pathtracer.utils.compcache import enable_compilation_cache
from tpu_pathtracer.utils.devtime import device_time

enable_compilation_cache()

scene = pt.default_scene(gradient_sky(64, 128))
scene_d = jax.device_put(scene.compile())
cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
params = RenderParams.create(cam, frame=1)

N = 20
for v in values:
    os.environ[knob] = v
    # knobs are read at trace time; new value -> new program
    budget = make_budget(512, 512, 1, 4, 1.0)
    np.asarray(budget(scene_d, params, N))  # compile+warm
    dt = device_time(lambda: budget(scene_d, params, N))
    total = sum(d for k, d in dt["programs"].items() if "jit_" in k)
    print(f"{knob}={v}: {total / N * 1e3:.3f} ms/frame", flush=True)
