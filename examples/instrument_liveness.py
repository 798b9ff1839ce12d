"""Instrument treelet-culling liveness on real headline bounce ray sets (dev).

Replays the fused sorted trace bounce-by-bounce on the default scene and
reports, per bounce: alive rays, live chunk fraction, live sub fraction,
winner-update fraction — the numbers that decide kernel strategy.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import tpu_pathtracer as pt
from tpu_pathtracer.ops import camera as camera_ops
from tpu_pathtracer.ops import envsample, rng
from tpu_pathtracer.ops.mt_matmul import mt_intersect
from tpu_pathtracer.ops.pallas.mt_intersect import treelet_boxes, _pad_to
from tpu_pathtracer.ops.trace import (
    _PIX_ACTIVE_BIT, _sort_ray_state, blocked_pixel_grid, bounce_shade,
    pack_shade_material_rows,
)
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.types import Camera, RenderParams
from tpu_pathtracer.utils.compcache import enable_compilation_cache

enable_compilation_cache()

TILE = 1024
CHUNK = 128
SUB = 32

scene = pt.default_scene(gradient_sky(64, 128))
sd = jax.device_put(scene.compile())
cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
params = RenderParams.create(cam, frame=1)

W = H = 512
R = W * H
xs, ys = blocked_pixel_grid(H, W)
uv = jnp.stack([xs / np.float32(W), ys / np.float32(H)], -1).reshape(R, 2)
pixel_index = (xs + ys * W).reshape(R)
seed = rng.pixel_seed(pixel_index, params.frame)
base_o, base_d = camera_ops.camera_rays(params.camera, uv, jnp.float32(1.0))
resolution = jnp.array([W, H], jnp.float32)
seed, ro, rd = camera_ops.apply_dof(seed, base_o, base_d, params.camera, resolution)

tri = np.asarray(sd.packed.tri_pos)
N = tri.shape[0]
n_pad = int(np.ceil(N / CHUNK)) * CHUNK
tri_p = np.asarray(_pad_to(jnp.asarray(tri), n_pad, 0))
cboxes = np.asarray(treelet_boxes(jnp.asarray(tri_p), CHUNK))  # (Mc, 8)
sboxes = np.asarray(treelet_boxes(jnp.asarray(tri_p), SUB))  # (Ms, 8)
shade_mat = pack_shade_material_rows(sd)
n_tris = N


def slab_np(boxes, ro, rd):
    """(K, 8) boxes x (R, 3) rays -> (K, R) entry distance, inf on miss."""
    INF = np.float32(np.inf)
    par = np.abs(rd) < 1e-7
    inv = 1.0 / np.where(par, 1.0, rd)
    tmin = np.full((boxes.shape[0], ro.shape[0]), -INF, np.float32)
    tmax = np.full_like(tmin, INF)
    ok = np.ones_like(tmin, bool)
    for k in range(3):
        lo = (boxes[:, k, None] - ro[None, :, k]) * inv[None, :, k]
        hi = (boxes[:, k + 3, None] - ro[None, :, k]) * inv[None, :, k]
        tn = np.where(par[None, :, k], -INF, np.minimum(lo, hi))
        tf = np.where(par[None, :, k], INF, np.maximum(lo, hi))
        inside = (ro[None, :, k] >= boxes[:, k, None]) & (
            ro[None, :, k] <= boxes[:, k + 3, None]
        )
        ok &= ~par[None, :, k] | inside
        tmin = np.maximum(tmin, tn)
        tmax = np.minimum(tmax, tf)
    hit = ok & (tmax >= np.maximum(0.0, tmin))
    return np.where(hit, tmin, INF)


intersect = jax.jit(lambda o, d: mt_intersect(sd.packed.tri_pos, o, d))
shade = jax.jit(
    lambda hit, carry: bounce_shade(sd, params, hit, carry,
                                    shade_mat=shade_mat, defer_env=True)
)

incoming = jnp.zeros((R, 3), jnp.float32)
color = jnp.ones((R, 3), jnp.float32)
pixact = jnp.arange(R, dtype=jnp.int32) | _PIX_ACTIVE_BIT

for bounce in range(4):
    active = pixact >= _PIX_ACTIVE_BIT
    am = active[:, None]
    ro_k = jnp.where(am, ro, 1e30)
    rd_k = jnp.where(am, rd, 0.0)

    # ---- host-side liveness accounting on the kernel's view --------------
    ro_np = np.asarray(ro_k).reshape(-1, TILE, 3)
    rd_np = np.asarray(rd_k).reshape(-1, TILE, 3)
    n_tiles = ro_np.shape[0]
    tiles_alive = 0
    live_chunks = 0
    live_subs = 0
    # best_t unknown without running; use INF (upper bound on liveness)
    for ti in range(n_tiles):
        if not np.any(np.abs(rd_np[ti]).sum(-1) > 0):
            continue
        tiles_alive += 1
        ce = slab_np(cboxes, ro_np[ti], rd_np[ti])  # (Mc, TILE)
        clive = np.isfinite(ce).any(1)
        live_chunks += int(clive.sum())
        for c in np.nonzero(clive)[0]:
            se = slab_np(sboxes[c * 4:(c + 1) * 4], ro_np[ti], rd_np[ti])
            live_subs += int(np.isfinite(se).any(1).sum())
    alive = int(np.asarray(active).sum())
    print(
        f"bounce {bounce}: alive {alive:6d} ({alive/R*100:4.1f}%)  "
        f"tiles {tiles_alive:3d}/{n_tiles}  "
        f"live chunks {live_chunks:5d} ({live_chunks/max(tiles_alive,1):.1f}/tile of {cboxes.shape[0]})  "
        f"live subs {live_subs:5d} ({live_subs/max(tiles_alive,1):.1f}/tile of {sboxes.shape[0]})",
        flush=True,
    )

    hit = intersect(ro_k, rd_k)
    carry = (ro, rd, incoming, color, seed, active)
    ro, rd, incoming, color, seed, active = shade(hit, carry)
    octant = ((rd[:, 0] > 0).astype(jnp.int32) * 4
              + (rd[:, 1] > 0).astype(jnp.int32) * 2
              + (rd[:, 2] > 0).astype(jnp.int32))
    key = jnp.where(active, jnp.clip(hit.tri, 0, n_tris - 1) * 8 + octant,
                    jnp.int32(2 ** 31 - 1))
    pixact = (pixact & (_PIX_ACTIVE_BIT - 1)) | jnp.where(
        active, _PIX_ACTIVE_BIT, 0)
    # _sort_ray_state is component-major (3, R); transpose at the boundary
    ro_t, rd_t, color_t, incoming_t, seed, pixact = _sort_ray_state(
        key, ro.T, rd.T, color.T, incoming.T, seed, pixact)
    ro, rd, color, incoming = ro_t.T, rd_t.T, color_t.T, incoming_t.T
