"""Micro-benchmark: VPU term-loop vs MXU-matmul determinants in the fused
MT kernel (dev tool, run on-chip).

Times mt_intersect_pallas2_phi on the headline frame's PRIMARY rays
(512^2, blocked pixel order, default 2048-tri scene) — the most expensive
intersect call of the frame (unsorted tiles, most chunks live).  K kernel
invocations run inside one jitted fori_loop with a value feedback (phi
perturbed by 0*prev_t) so XLA cannot hoist the loop-invariant call; the
slope between K and 2K cancels dispatch latency.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import tpu_pathtracer as pt
from tpu_pathtracer.ops import camera as camera_ops
from tpu_pathtracer.ops.mt_matmul import ray_features
from tpu_pathtracer.ops.pallas.mt_shade import mt_intersect_pallas2_phi
from tpu_pathtracer.ops.trace import blocked_pixel_grid
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.types import Camera
from tpu_pathtracer.utils.compcache import enable_compilation_cache

enable_compilation_cache()

W = H = 512
scene = pt.default_scene(gradient_sky(64, 128))
data = jax.device_put(scene.compile())
cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)

xs, ys = blocked_pixel_grid(H, W)
uv = jnp.stack([xs.astype(jnp.float32) / W, ys.astype(jnp.float32) / H],
               axis=-1)
ro, rd = camera_ops.camera_rays(cam, uv, jnp.float32(1.0))
phi0 = jax.device_put(ray_features(ro, rd).T)  # (10, R)
tri = data.packed.tri_pos


def make_loop(mxu, tile_rays, cull="cond"):
    @jax.jit
    def loop(phi, k):
        def body(i, carry):
            phi, acc = carry
            h = mt_intersect_pallas2_phi(tri, phi, mxu_dets=mxu,
                                         tile_rays=tile_rays, cull=cull)
            # feedback: 0-valued perturbation defeats loop-invariant hoisting
            phi = phi + (h.t * 0.0)[None, :]
            return phi, acc + jnp.sum(h.t == 0)

        return jax.lax.fori_loop(0, k, body, (phi, jnp.int32(0)))[1]

    return loop


def slope_ms(loop, k1=50):
    np.asarray(loop(phi0, 1))  # compile
    t = {}
    for k in (k1, 2 * k1):
        np.asarray(loop(phi0, k))  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(phi0, k))
            ts.append(time.perf_counter() - t0)
        t[k] = sorted(ts)[1]
    return (t[2 * k1] - t[k1]) / k1 * 1e3


import itertools

combos = itertools.product(("cond", "list", "nf"), (1024,), (False,))
for cull, tile_rays, mxu in combos:
    try:
        ms = slope_ms(make_loop(mxu, tile_rays, cull))
    except Exception as e:
        print(f"cull={cull} tile_rays={tile_rays} mxu={int(mxu)}: "
              f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        continue
    print(f"cull={cull} tile_rays={tile_rays} mxu={int(mxu)}: "
          f"{ms:.3f} ms/call "
          f"({W*H/ms*1e3/1e6:.0f} Mrays/s primary)", flush=True)
