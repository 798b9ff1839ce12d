"""Environment-map CDF construction (host side, vectorized).

Numpy port of the reference's CPU CDF builder
(reference: src/renderer.ts:159-266), which packs per-texel
(marginalCDF, conditionalCDF, pdf, 1) into an rgba32float texture:

  * luminance with Rec.709 weights (renderer.ts:163-171),
  * solid-angle weighting by sin(theta), theta = pi*(y+0.5)/H
    (renderer.ts:177-187),
  * marginal CDF over rows: exclusive prefix sum of normalized
    row totals of the *weighted* luminance (renderer.ts:189-217),
  * per-row conditional CDF: exclusive prefix sum of *unweighted*
    luminance normalized by the row total (renderer.ts:219-251),
  * pdf channel = the weighted luminance itself (renderer.ts:253-266).

The reference recomputes each prefix from scratch (O(W^2 H)); this is a
straight cumsum in float64 (JS arithmetic is f64) stored to f32, which matches
its sequential addition order bit-for-bit at f32 precision.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .types import EnvironmentMap


def build_cdf_tables(radiance: np.ndarray):
    """Returns (marginal_cdf (H,W), conditional_cdf (H,W), pdf (H,W)) f32."""
    rad = np.asarray(radiance, np.float64)
    h, w = rad.shape[0], rad.shape[1]

    lum = 0.2126 * rad[..., 0] + 0.7152 * rad[..., 1] + 0.0722 * rad[..., 2]

    theta = (np.arange(h, dtype=np.float64) + 0.5) / h * np.pi
    weighted = lum * np.sin(theta)[:, None]

    row_totals = weighted.sum(axis=1)
    total = row_totals.sum()
    norm_rows = row_totals / total
    marginal = np.concatenate([[0.0], np.cumsum(norm_rows)[:-1]])
    marginal_2d = np.broadcast_to(marginal[:, None], (h, w))

    lum_row_totals = lum.sum(axis=1, keepdims=True)
    col_norm = lum / lum_row_totals
    conditional = np.concatenate(
        [np.zeros((h, 1)), np.cumsum(col_norm, axis=1)[:, :-1]], axis=1
    )

    # True uv-measure density of the sampler that inverts these CDFs:
    # P(texel y,x) = P(row y) * P(col x | row y) = norm_rows[y] * col_norm[y,x]
    # -> density over the unit uv square = P(texel) * H * W.
    # (The reference's packed pdf channel is just `weighted` — not a density;
    # its consumer shipped commented out, raytrace.wgsl:398.)
    sample_pdf = norm_rows[:, None] * col_norm * (h * w)

    return (
        marginal_2d.astype(np.float32),
        conditional.astype(np.float32),
        weighted.astype(np.float32),
        sample_pdf.astype(np.float32),
    )


def build_environment(radiance: np.ndarray) -> EnvironmentMap:
    """Full env-map compile: radiance + CDF tables as a device pytree.

    The reference hard-requires 1024x512 float input (renderer.ts:133-143);
    we accept any (H, W, 3) float array.
    """
    rad = np.asarray(radiance, np.float32)
    if rad.ndim != 3 or rad.shape[2] < 3:
        raise ValueError(f"environment radiance must be (H, W, 3), got {rad.shape}")
    rad = rad[..., :3]
    marginal, conditional, pdf, sample_pdf = build_cdf_tables(rad)
    return EnvironmentMap(
        radiance=jnp.asarray(rad),
        marginal_cdf=jnp.asarray(marginal),
        conditional_cdf=jnp.asarray(conditional),
        pdf=jnp.asarray(pdf),
        sample_pdf=jnp.asarray(sample_pdf),
    )


def gradient_sky(height: int = 512, width: int = 1024, horizon=(1.0, 0.9, 0.7), zenith=(0.2, 0.4, 0.9), ground=(0.15, 0.12, 0.1), intensity: float = 1.0) -> np.ndarray:
    """Simple analytic sky for tests/demos (no counterpart in the reference,
    which ships .hdr files; this avoids binary fixtures in tests)."""
    v = (np.arange(height, dtype=np.float32) + 0.5) / height  # 0 = top (zenith)
    elev = np.cos(v * np.pi)  # 1 at top, -1 at bottom
    up = np.clip(elev, 0.0, 1.0)[:, None]  # (H, 1)
    down = np.clip(-elev, 0.0, 1.0)[:, None]
    horizon_w = 1.0 - up - down
    col = (
        up * np.asarray(zenith, np.float32)[None, :]
        + down * np.asarray(ground, np.float32)[None, :]
        + horizon_w * np.asarray(horizon, np.float32)[None, :]
    )  # (H, 3)
    img = np.broadcast_to(col[:, None, :], (height, width, 3)).copy()
    # Add a bright azimuthal "sun" blob so importance sampling has structure.
    u = (np.arange(width, dtype=np.float32) + 0.5) / width
    sun = np.exp(-(((u - 0.25) * 24.0) ** 2))[None, :, None] * np.exp(
        -(((v - 0.3) * 12.0) ** 2)
    )[:, None, None]
    img += sun * np.asarray([40.0, 36.0, 30.0], np.float32)
    return (img * intensity).astype(np.float32)
