"""Bilinear display upscale (the resolution-scaling half of the fullscreen
pass: the reference renders at scalingFactor * canvas and samples the scaled
sub-region with a linear sampler, reference: src/passes/shaders/
fullscreen.wgsl:47, src/renderer.ts:39,310-320).

Coordinate mapping matches the reference's sampler math: display pixel center
(X+0.5)/W maps to render-space texel coordinate (X+0.5)*sw/W - 0.5.  Edges are
clamped (the reference's repeat sampler would wrap into uninitialized texture
there; clamping is the well-defined choice)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.envsample import sample_bilinear


def bilinear_resize(img, height: int, width: int):
    """img (h, w, C) -> (height, width, C)."""
    if img.shape[0] == height and img.shape[1] == width:
        return img
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    return sample_bilinear(img, uv)
