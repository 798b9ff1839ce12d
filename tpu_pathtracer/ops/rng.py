"""Counter-free sequential RNG, bit-exact with the reference's WGSL stream.

The reference threads a mutable u32 seed per pixel through every sampling
decision (reference: src/passes/shaders/raytrace.wgsl:253-287, seeded at
raytrace.wgsl:435-436 as `pixelIndex + frame*719393 + 123456789`).  We keep the
identical integer stream — a (R,)-shaped uint32 array advanced functionally —
so forward images can be compared against the reference at matched seeds.
Box–Muller / trig use f32 transcendentals, where XLA and Metal/DX backends may
differ in the last ulp; integer state never drifts.

All functions are shape-polymorphic over the leading ray axis and return
`(new_seed, value)`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SEED = np.uint32(123456789)  # raytrace.wgsl:1
TWOPI = np.float32(6.28318530718)  # raytrace.wgsl:3
U32_NORM = np.float32(4294967295.0)  # rounds to 2^32 in f32, like WGSL's literal


def pixel_seed(pixel_index, frame):
    """seed = index + frame*719393 + SEED (raytrace.wgsl:435-436)."""
    idx = jnp.asarray(pixel_index).astype(jnp.uint32)
    f = jnp.asarray(frame).astype(jnp.uint32)
    return idx + f * jnp.uint32(719393) + SEED


def rand(seed):
    """PCG-style hash advance (raytrace.wgsl:253-259); returns uniform f32 [0,1]."""
    seed = seed * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((seed >> ((seed >> jnp.uint32(28)) + jnp.uint32(4))) ^ seed) * jnp.uint32(277803737)
    word = (word >> jnp.uint32(22)) ^ word
    return seed, word.astype(jnp.float32) / U32_NORM


def rand_normal(seed):
    """Box–Muller (raytrace.wgsl:261-265)."""
    seed, r1 = rand(seed)
    seed, r2 = rand(seed)
    theta = TWOPI * r1
    rho = jnp.sqrt(np.float32(-2.0) * jnp.log(r2))
    return seed, rho * jnp.cos(theta)


def rand_direction(seed):
    """Uniform sphere direction via 3 normals (raytrace.wgsl:267-272).
    Returns (..., 3)."""
    seed, x = rand_normal(seed)
    seed, y = rand_normal(seed)
    seed, z = rand_normal(seed)
    v = jnp.stack([x, y, z], axis=-1)
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return seed, v / n


def rand_cosine_hemisphere(seed, normal):
    """normalize(normal + random_direction) (raytrace.wgsl:279-281)."""
    seed, d = rand_direction(seed)
    v = normal + d
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return seed, v / n


def disk_from_uniforms(r1, r2):
    """Map two uniforms to a uniform disk point (the raytrace.wgsl:283-287
    parameterization), shared by the hash-driven and low-discrepancy
    (blue-noise) samplers."""
    theta = TWOPI * r1
    rho = jnp.sqrt(r2)
    return jnp.stack([rho * jnp.cos(theta), rho * jnp.sin(theta)], axis=-1)


def rand_point_in_circle(seed):
    """Uniform disk point (raytrace.wgsl:283-287). Returns (..., 2)."""
    seed, r1 = rand(seed)
    seed, r2 = rand(seed)
    return seed, disk_from_uniforms(r1, r2)
