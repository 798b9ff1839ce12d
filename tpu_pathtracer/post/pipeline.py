"""The full post pipeline: denoise -> upscale -> tonemap (the reference's
fullscreen pass, src/passes/fullscreen.ts + fullscreen.wgsl:110-132)."""

from __future__ import annotations

from ..config import PostConfig, Tonemap
from .denoise import smart_denoise
from .resize import bilinear_resize
from .tonemap import tonemap


def postprocess(img, config: PostConfig, display_height: int | None = None, display_width: int | None = None):
    """img: (h, w, 3) linear radiance -> display-ready (H, W, 3) in [0,1]-ish."""
    out = img
    if config.denoise:
        out = smart_denoise(
            out,
            sigma=config.denoise_sigma,
            k_sigma=config.denoise_k_sigma,
            threshold=config.denoise_threshold,
        )
    if display_height is not None and display_width is not None:
        out = bilinear_resize(out, display_height, display_width)
    out = tonemap(out, config.tonemap)
    return out
