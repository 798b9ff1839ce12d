"""Pallas TPU kernel for the bilateral "smart denoise" stencil.

Same math as post/denoise.smart_denoise (the reference fragment shader,
src/passes/shaders/fullscreen.wgsl:53-86): circular tap support with
fractional row offsets resolved by a two-row lerp, Gaussian spatial weight x
Gaussian range weight on the rgb distance, wrap (repeat-sampler) addressing.

Why a kernel: the XLA formulation materializes 2 full-image shifts per tap
(~176 shifted copies); this kernel streams each row band through VMEM once —
one HBM read + one write of the image, with all taps computed in-register.

Layout: channel-planes (3, H, W); W must be a multiple of 128 (lane dim) —
callers fall back to the jnp path otherwise.  Rows are processed in bands
with a +-radius halo; the caller passes the input pre-padded with `radius`
wrap rows top and bottom, so in-kernel row indexing is static slices.
Column wrap uses lane-axis rolls.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...post.denoise import INV_PI, INV_SQRT_OF_2PI, _taps


def _denoise_kernel(img_ref, out_ref, scratch, sem, *, taps, band, halo,
                    inv_sigma_qx2, inv_sigma_qx2_pi, inv_threshold_sqx2,
                    inv_threshold_sqrt_2pi):
    i = pl.program_id(0)
    # DMA this band (+halo) of the padded image: rows [i*band, i*band+band+2h).
    # `halo` is radius rounded up to the 8-row sublane tile (Mosaic requires
    # tile-aligned DMA slice shapes).
    dma = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(i * band, band + 2 * halo), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    center = [scratch[c, halo:halo + band, :] for c in range(3)]
    z = jnp.zeros_like(center[0])
    a = [jnp.zeros_like(center[0]) for _ in range(3)]

    for dx, dy in taps:
        y0 = math.floor(dy)
        fy = dy - y0
        ix = int(dx)
        r0 = halo + y0

        def shifted(c, row):
            plane = scratch[c, row:row + band, :]
            if ix:
                # value[p] = plane[p + ix] with wrap == roll by (-ix mod W)
                plane = pltpu.roll(plane, (-ix) % plane.shape[1], 1)
            return plane

        s = [shifted(c, r0) for c in range(3)]
        if fy > 0.0:
            s1 = [shifted(c, r0 + 1) for c in range(3)]
            f = np.float32(fy)
            s = [s[c] + (s1[c] - s[c]) * f for c in range(3)]

        blur = math.exp(-(dx * dx + dy * dy) * inv_sigma_qx2) * inv_sigma_qx2_pi
        d = [s[c] - center[c] for c in range(3)]
        dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        delta = jnp.exp(dist2 * np.float32(-inv_threshold_sqx2)) * np.float32(
            inv_threshold_sqrt_2pi * blur
        )
        z = z + delta
        for c in range(3):
            a[c] = a[c] + delta * s[c]

    inv_z = 1.0 / z
    for c in range(3):
        out_ref[c, :, :] = a[c] * inv_z


def supported(height: int, width: int, k_sigma: float = 1.0,
              sigma: float = 5.0) -> bool:
    """The kernel needs a lane-aligned width and enough rows to build the
    sublane-aligned wrap halo (halo = radius rounded up to 8)."""
    radius = int(round(k_sigma * sigma))
    halo = -(-radius // 8) * 8
    # height % 8: the row-band DMA slices must be sublane-tile aligned
    return width % 128 == 0 and height % 8 == 0 and height >= halo


@functools.partial(jax.jit, static_argnames=("sigma", "k_sigma", "threshold"))
def smart_denoise_pallas(img, sigma: float = 5.0, k_sigma: float = 1.0,
                         threshold: float = 0.08):
    """img: (H, W, 3) f32 -> (H, W, 3) f32.  Requires W % 128 == 0."""
    H, W = img.shape[0], img.shape[1]
    radius = int(round(k_sigma * sigma))
    taps = tuple(_taps(float(radius)))
    halo = -(-radius // 8) * 8  # sublane-tile-aligned halo

    # channel planes + wrap-row padding (the repeat sampler's row wrap)
    planes = jnp.moveaxis(img, -1, 0)  # (3, H, W)
    padded = jnp.concatenate(
        [planes[:, H - halo:, :], planes, planes[:, :halo, :]], axis=1
    )  # (3, H + 2*halo, W)

    # pick a band height that divides H, prefer ~64 rows
    band = H
    for cand in (64, 32, 16, 8):
        if H % cand == 0:
            band = cand
            break

    kernel = functools.partial(
        _denoise_kernel,
        taps=taps,
        band=band,
        halo=halo,
        inv_sigma_qx2=0.5 / (sigma * sigma),
        inv_sigma_qx2_pi=float(INV_PI) * (0.5 / (sigma * sigma)),
        inv_threshold_sqx2=0.5 / (threshold * threshold),
        inv_threshold_sqrt_2pi=float(INV_SQRT_OF_2PI) / threshold,
    )
    out = pl.pallas_call(
        kernel,
        grid=(H // band,),
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (3, band, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, band + 2 * halo, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(padded)
    return jnp.moveaxis(out, 0, -1)
