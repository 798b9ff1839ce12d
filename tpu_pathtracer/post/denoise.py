"""Smart denoise: circular-kernel bilateral Gaussian blur.

Port of the reference's fragment-shader denoiser (credited there to
raytracing-bloom-video's quad.wgsl; reference: src/passes/shaders/
fullscreen.wgsl:53-86, invoked with sigma=5, kSigma=1, threshold=0.08 at
fullscreen.wgsl:118).  Faithful details:

  * circular support: for column offset x in [-r, r], row offsets run from
    -sqrt(r^2-x^2) upward in steps of 1.0 — i.e. *fractional* row offsets,
    which the reference resolves with bilinear texture filtering.  We
    reproduce that with a two-row lerp.
  * the reference samples with a repeat-addressing sampler, so edge taps wrap;
    jnp.roll gives the same wrap behavior at scaling factor 1.
  * the range kernel uses the rgba difference; alpha is constant 1 so the rgb
    distance is identical.

Evaluated at display resolution after the upscale, matching the
reference's order (post/pipeline.py; fullscreen.wgsl:47,117-119).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

INV_PI = np.float32(0.31830988618379067153776752674503)
INV_SQRT_OF_2PI = np.float32(0.39894228040143267793994605993439)


def _taps(radius: float):
    """Static (dx, dy, blur_weight) tap list matching the WGSL loop order."""
    taps = []
    x = -radius
    while x <= radius:
        pt = math.sqrt(radius * radius - x * x)
        y = -pt
        while y <= pt:
            taps.append((x, y))
            y += 1.0
        x += 1.0
    return taps


def smart_denoise(img, sigma: float = 5.0, k_sigma: float = 1.0, threshold: float = 0.08):
    """img: (H, W, 3) f32 -> (H, W, 3) f32."""
    radius = float(round(k_sigma * sigma))
    inv_sigma_qx2 = 0.5 / (sigma * sigma)
    inv_sigma_qx2_pi = float(INV_PI) * inv_sigma_qx2
    inv_threshold_sqx2 = 0.5 / (threshold * threshold)
    inv_threshold_sqrt_2pi = float(INV_SQRT_OF_2PI) / threshold

    center = img
    z_buff = jnp.zeros(img.shape[:2] + (1,), jnp.float32)
    a_buff = jnp.zeros_like(img)

    for dx, dy in _taps(radius):
        y0 = math.floor(dy)
        fy = dy - y0
        ix = int(dx)
        # Sample at (col + dx, row + dy) with wrap: value[p] = img[p + d].
        s0 = jnp.roll(img, shift=(-y0, -ix), axis=(0, 1))
        if fy > 0.0:
            s1 = jnp.roll(img, shift=(-(y0 + 1), -ix), axis=(0, 1))
            s = s0 + (s1 - s0) * np.float32(fy)
        else:
            s = s0
        blur = math.exp(-(dx * dx + dy * dy) * inv_sigma_qx2) * inv_sigma_qx2_pi
        d_c = s - center
        dist2 = jnp.sum(d_c * d_c, axis=-1, keepdims=True)
        delta = jnp.exp(-dist2 * np.float32(inv_threshold_sqx2)) * np.float32(
            inv_threshold_sqrt_2pi * blur
        )
        z_buff = z_buff + delta
        a_buff = a_buff + delta * s

    return a_buff / z_buff
