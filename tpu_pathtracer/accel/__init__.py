from .bvh import build_bvh_flat

__all__ = ["build_bvh_flat"]
