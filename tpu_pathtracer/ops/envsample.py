"""Environment-map sampling: equirect UV mapping, texture filtering, and CDF
importance sampling.

Reference behavior (src/passes/shaders/raytrace.wgsl:289-371):
  * ray -> UV with Y-axis rotation, phi = atan2(x, z), theta = asin(y)
    (raytrace.wgsl:289-313),
  * radiance texture sampled bilinearly (linear sampler, renderer.ts:112-121;
    WebGPU default clamp-to-edge addressing),
  * CDF texture sampled nearest (renderer.ts:123-130),
  * importance sampling via 8-step binary search over the marginal (v) then
    conditional (u) CDFs (raytrace.wgsl:315-349).  The reference ships this
    disabled (call commented out at raytrace.wgsl:398); we implement it as a
    first-class, optional path *with* the PDF correction the reference left
    commented (raytrace.wgsl:402-404).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import rng
from .vecmath import EPSILON

INVPI = np.float32(0.31830988618)  # raytrace.wgsl:4
INVTWOPI = np.float32(0.15915494309)  # raytrace.wgsl:5


def env_uv_from_ray(rd, rotation):
    """Equirect UV for (possibly non-unit) direction (raytrace.wgsl:289-313).

    Non-unit directions arise because the reference does not renormalize after
    the diffuse/specular mix (raytrace.wgsl:391); asin's clamp handles them.
    """
    cos_r = jnp.cos(rotation)
    sin_r = jnp.sin(rotation)
    dx = rd[..., 0] * cos_r - rd[..., 2] * sin_r
    dy = rd[..., 1]
    dz = rd[..., 0] * sin_r + rd[..., 2] * cos_r
    phi = jnp.arctan2(dx, dz)
    theta = jnp.arcsin(jnp.clip(dy, -1.0, 1.0))
    return jnp.stack([phi * INVTWOPI + 0.5, -theta * INVPI + 0.5], axis=-1)


def sample_bilinear(img, uv):
    """Bilinear texture fetch with clamp-to-edge; img (H, W, C), uv (..., 2)."""
    h, w = img.shape[0], img.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    # clamp each tap independently of the other (clamp-to-edge addressing)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    c00 = img[y0, x0]
    c10 = img[y0, x1]
    c01 = img[y1, x0]
    c11 = img[y1, x1]
    top = c00 + (c10 - c00) * fx
    bot = c01 + (c11 - c01) * fx
    return top + (bot - top) * fy


def sample_nearest(img, uv):
    """Nearest texture fetch with clamp-to-edge; img (H, W) or (H, W, C)."""
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return img[y, x]


def env_radiance(env, uv):
    """getEnvironmentMapColor (raytrace.wgsl:369-371)."""
    return sample_bilinear(env.radiance, uv)


def env_importance_sample(env, seed):
    """8-step binary-search inversion of the marginal/conditional CDFs
    (raytrace.wgsl:315-349).  Returns (seed, uv (..., 2))."""
    seed, r1 = rng.rand(seed)
    seed, r2 = rng.rand(seed)

    def search(cdf_lookup, target, shape):
        lo = jnp.zeros(shape, jnp.float32)
        hi = jnp.ones(shape, jnp.float32)
        for _ in range(8):
            mid = (lo + hi) * 0.5
            value = jnp.maximum(cdf_lookup(mid), EPSILON)
            go_right = value < target
            lo = jnp.where(go_right, mid, lo)
            hi = jnp.where(go_right, hi, mid)
        return (lo + hi) * 0.5

    shape = r1.shape
    half = jnp.full(shape, 0.5, jnp.float32)

    v = search(
        lambda m: sample_nearest(env.marginal_cdf, jnp.stack([half, m], axis=-1)),
        r1,
        shape,
    )
    u = search(
        lambda m: sample_nearest(env.conditional_cdf, jnp.stack([m, v], axis=-1)),
        r2,
        shape,
    )
    return seed, jnp.stack([u, v], axis=-1)


def env_pdf(env, uv):
    """getEnvironmentMapPDF (raytrace.wgsl:363-367), nearest-sampled, floored."""
    return jnp.maximum(sample_nearest(env.pdf, uv), EPSILON)
