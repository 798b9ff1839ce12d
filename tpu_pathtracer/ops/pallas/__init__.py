"""Pallas TPU kernels — the native device-kernel layer (SURVEY.md §7 C).

Kernels dispatch from their XLA counterparts when running on TPU hardware;
the XLA implementations remain the portable semantics oracle.
"""

from .denoise import smart_denoise_pallas

__all__ = ["smart_denoise_pallas"]
