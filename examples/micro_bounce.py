"""Micro-benchmark: per-cull-mode kernel cost on REAL bounce-N ray sets
(dev tool, run on-chip).

Builds the headline frame's actual bounce-0/1/2 ray distributions (replay
via the XLA mt path + the fused loop's sort, exactly as trace_rays_fused
does) and times mt_intersect_pallas2_phi on each, per cull mode.  This is
the breakdown the aggregated profiler spans can't give (both sort-loop
bounces share one op name).
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
from tpu_pathtracer.ops import rng
from tpu_pathtracer.ops.mt_matmul import mt_intersect, ray_features
from tpu_pathtracer.ops.pallas.mt_shade import mt_intersect_pallas2_phi
from tpu_pathtracer.ops.trace import (
    _PIX_ACTIVE_BIT, _sort_ray_state, blocked_pixel_grid, bounce_shade,
    pack_shade_material_rows,
)
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.types import Camera, RenderParams
from tpu_pathtracer.utils.compcache import enable_compilation_cache

enable_compilation_cache()

W = H = 512
R = W * H
scene = pt.default_scene(gradient_sky(64, 128))
sd = jax.device_put(scene.compile())
cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
params = RenderParams.create(cam, frame=1)
tri = sd.packed.tri_pos
n_tris = tri.shape[0]
shade_mat = pack_shade_material_rows(sd)

xs, ys = blocked_pixel_grid(H, W)
uv = jnp.stack([xs / np.float32(W), ys / np.float32(H)], -1).reshape(R, 2)
seed = rng.pixel_seed((xs + ys * W).reshape(R), params.frame)
base_o, base_d = camera_ops.camera_rays(params.camera, uv, jnp.float32(1.0))
resolution = jnp.array([W, H], jnp.float32)
seed, ro, rd = camera_ops.apply_dof(seed, base_o, base_d, params.camera,
                                    resolution)

# Replay bounces on the XLA path, sorting between bounces as the fused loop
# does; record each bounce's kernel-view (parked) phi.
phis = []
incoming = jnp.zeros((R, 3), jnp.float32)
color = jnp.ones((R, 3), jnp.float32)
pixact = jnp.arange(R, dtype=jnp.int32) | _PIX_ACTIVE_BIT
for bounce in range(3):
    active = pixact >= _PIX_ACTIVE_BIT
    am = active[:, None]
    ro_k = jnp.where(am, ro, 1e30)
    rd_k = jnp.where(am, rd, 0.0)
    phis.append(jax.device_put(ray_features(ro_k, rd_k).T))
    hit = jax.jit(mt_intersect)(tri, ro_k, rd_k)
    carry = (ro, rd, incoming, color, seed, active)
    ro, rd, incoming, color, seed, active = jax.jit(
        lambda h, c: bounce_shade(sd, params, h, c, shade_mat=shade_mat,
                                  defer_env=True))(hit, carry)
    import os
    if os.environ.get("MB_KEY", "oct") == "dirbin":
        from tpu_pathtracer.ops.trace import _direction_bin
        db = _direction_bin(rd.T)
        key = jnp.where(active,
                        jnp.clip(hit.tri, 0, n_tris - 1) * 96 + db,
                        jnp.int32(2 ** 31 - 1))
    else:
        octant = ((rd[:, 0] > 0).astype(jnp.int32) * 4
                  + (rd[:, 1] > 0).astype(jnp.int32) * 2
                  + (rd[:, 2] > 0).astype(jnp.int32))
        key = jnp.where(active, jnp.clip(hit.tri, 0, n_tris - 1) * 8 + octant,
                        jnp.int32(2 ** 31 - 1))
    pixact = (pixact & (_PIX_ACTIVE_BIT - 1)) | jnp.where(
        active, _PIX_ACTIVE_BIT, 0)
    ro_t, rd_t, color_t, incoming_t, seed, pixact = _sort_ray_state(
        key, ro.T, rd.T, color.T, incoming.T, seed, pixact)
    ro, rd, color, incoming = ro_t.T, rd_t.T, color_t.T, incoming_t.T


def make_loop(cull, tile_rays=1024, sub=None):
    @jax.jit
    def loop(phi, k):
        def body(i, carry):
            phi, acc = carry
            h = mt_intersect_pallas2_phi(tri, phi, tile_rays=tile_rays,
                                         cull=cull, sub=sub)
            phi = phi + (h.t * 0.0)[None, :]
            return phi, acc + jnp.sum(h.t == 0)

        return jax.lax.fori_loop(0, k, body, (phi, jnp.int32(0)))[1]

    return loop


def slope_ms(loop, phi0, k1=50):
    np.asarray(loop(phi0, 1))
    t = {}
    for k in (k1, 2 * k1):
        np.asarray(loop(phi0, k))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(phi0, k))
            ts.append(time.perf_counter() - t0)
        t[k] = sorted(ts)[1]
    return (t[2 * k1] - t[k1]) / k1 * 1e3


import itertools
for cull, tile, sb in itertools.product(("nf",), (512,), (32, 16, 8)):
    try:
        loop = make_loop(cull, tile_rays=tile, sub=sb)
        times = [slope_ms(loop, p) for p in phis]
    except Exception as e:
        print(f"cull={cull} tile={tile} sub={sb}: FAILED {str(e)[:100]}", flush=True)
        continue
    print(f"cull={cull} tile={tile} sub={sb}: " + "  ".join(
        f"b{i}={t:.3f}ms" for i, t in enumerate(times)), flush=True)
