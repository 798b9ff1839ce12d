"""On-chip inverse-rendering evidence (BASELINE.json configs[4]).

Recovers all material albedos of the default Cornell-class scene from a
rendered target image by Adam on pixel-gradients (path-replay backprop,
diff/), running on whatever backend `jax.default_backend()` resolves —
the driver-visible artifact `INVERT_TPU.json` records the backend, the
loss curve, and the recovered-vs-true color table so gradient correctness
is evidenced on real TPU hardware, not only on the virtual CPU mesh
(tests/test_diff.py, tests/test_parallel.py).

Usage: python examples/invert_onchip.py [steps] [size]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import tpu_pathtracer as pt
from tpu_pathtracer import diff
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.types import RenderParams
from tpu_pathtracer.utils.compcache import enable_compilation_cache

enable_compilation_cache()

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 80
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 64

scene = pt.default_scene(gradient_sky(16, 32))
scene_data = jax.device_put(scene.compile())
cam = pt.Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
params = RenderParams.create(cam, frame=1)
kw = dict(width=SIZE, height=SIZE, aspect=1.0, samples_per_frame=1,
          max_bounces=2)

target = diff.render_frame_diff(scene_data, params, **kw)

rng = np.random.default_rng(0)
n_mat = scene_data.materials.color.shape[0]
wrong = jnp.asarray(rng.random((n_mat, 3)), jnp.float32)
bad = dataclasses.replace(
    scene_data, materials=dataclasses.replace(scene_data.materials,
                                              color=wrong))

t0 = time.perf_counter()
res = diff.invert(bad, params, target, ["materials.color"], steps=STEPS,
                  learning_rate=5e-2, **kw)
wall = time.perf_counter() - t0

true_c = np.asarray(scene_data.materials.color)
rec = np.asarray(res.values["materials.color"])
artifact = {
    "backend": jax.default_backend(),
    "devices": [str(d) for d in jax.devices()],
    "config": dict(kw, steps=STEPS, optimizer="adam(5e-2)",
                   recovered="materials.color", init="uniform random"),
    "loss_first": res.losses[0],
    "loss_final": res.final_loss,
    "loss_curve_every5": res.losses[::5],
    "recovered_vs_true": [
        {"material": i, "true": [round(float(v), 4) for v in true_c[i]],
         "recovered": [round(float(v), 4) for v in rec[i]],
         "max_abs_err": round(float(np.abs(rec[i] - true_c[i]).max()), 5)}
        for i in range(n_mat)
    ],
    "color_max_abs_err": float(np.abs(rec - true_c).max()),
    "wall_s": wall,
}
out = os.path.join(os.path.dirname(__file__), "..", "INVERT_TPU.json")
with open(out, "w") as f:
    json.dump(artifact, f, indent=1)
print(json.dumps({"loss_final": res.final_loss,
                  "color_max_abs_err": artifact["color_max_abs_err"],
                  "backend": artifact["backend"]}))
