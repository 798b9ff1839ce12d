"""Fused Pallas TPU kernel for the MXU Möller–Trumbore intersector.

Same math as ops/mt_matmul.py (the bilinear-form factorization of
raytrace.wgsl:78-116), fused so the (R, 4N) pair-determinant intermediate
never leaves VMEM: the XLA formulation writes + re-reads it through HBM
(~17 GB per bounce at 512² x 2K tris), which dominates its runtime.

Layout (chosen for the VPU's 8x128 vregs):
  * rays live along LANES: phi_t is (10, R), tiled to (10, TR) blocks,
  * triangles live along SUBLANES: coefficient rows (4N, 10) with quantity-
    major row blocks [a | u*a | v*a | t*a] of N rows each,
  * each grid step computes one ray tile against all triangles in chunks of
    C sublane rows: four (C, 10) @ (10, TR) MXU dots + a (C, TR) VPU
    epilogue + a sublane min/argmin reduction, carrying the running best
    hit in registers.

Outputs are (1, R) rows (t, tri, u, v) assembled into an intersect.Hit by
the wrapper.  Nearest hit wins; exact-t ties resolve to the lowest triangle
index (brute_force_intersect contract) because the within-chunk argmin
takes the lowest row and the cross-chunk update uses strict <.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..intersect import Hit
from ..mt_matmul import ray_features, triangle_columns
from ..vecmath import EPSILON, INF

# Ray-tile (lanes) and triangle-chunk (sublanes) sizes.  TR is a multiple of
# 128 (lane width); C a multiple of 8 (f32 sublanes).  dets per chunk are
# 4 x (C, TR) f32 = 2 MB at the defaults — comfortably VMEM-resident.
TILE_RAYS = 512
CHUNK_TRIS = 512

_BIG_I32 = np.int32(2**31 - 1)


def _kernel(phi_ref, cols_ref, t_ref, idx_ref, u_ref, v_ref, *, n_tris, chunk):
    """One ray tile vs all triangles.  phi_ref: (10, TR); cols_ref: (4N, 10)
    quantity-major; outputs: (1, TR) each."""
    phi = phi_ref[:]  # (10, TR)
    tr = phi.shape[1]
    n_chunks = n_tris // chunk

    def chunk_body(c, best):
        best_t, best_i, best_u, best_v = best
        c0 = c * chunk

        def dets(q):
            rows = cols_ref[pl.ds(q * n_tris + c0, chunk), :]  # (C, 10)
            return jnp.dot(rows, phi, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (C, TR)

        a, ua, va, ta = dets(0), dets(1), dets(2), dets(3)

        abs_a = jnp.abs(a)
        sa = jnp.sign(a)
        us = ua * sa
        vs = va * sa
        ts = ta * sa
        valid = (
            (abs_a >= EPSILON)
            & (us >= 0.0)
            & (us <= abs_a)
            & (vs >= 0.0)
            & (us + vs <= abs_a)
            & (ts > EPSILON * abs_a)
        )
        f = jnp.float32(1.0) / jnp.where(abs_a >= EPSILON, a, jnp.float32(1.0))
        t = jnp.where(valid, ta * f, INF)  # (C, TR)

        tmin = jnp.min(t, axis=0, keepdims=True)  # (1, TR)
        rows_i = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + c0
        sel_rows = jnp.where(t == tmin, rows_i, _BIG_I32)
        imin = jnp.min(sel_rows, axis=0, keepdims=True)  # lowest-index tie
        sel = sel_rows == imin  # exactly one row per lane (or none if no tie row)
        u_w = jnp.sum(jnp.where(sel, ua * f, 0.0), axis=0, keepdims=True)
        v_w = jnp.sum(jnp.where(sel, va * f, 0.0), axis=0, keepdims=True)

        take = tmin < best_t
        return (
            jnp.where(take, tmin, best_t),
            jnp.where(take, imin, best_i),
            jnp.where(take, u_w, best_u),
            jnp.where(take, v_w, best_v),
        )

    init = (
        jnp.full((1, tr), INF, jnp.float32),
        jnp.full((1, tr), -1, jnp.int32),
        jnp.zeros((1, tr), jnp.float32),
        jnp.zeros((1, tr), jnp.float32),
    )
    best_t, best_i, best_u, best_v = jax.lax.fori_loop(
        0, n_chunks, chunk_body, init
    )
    t_ref[:] = best_t
    idx_ref[:] = best_i
    u_ref[:] = best_u
    v_ref[:] = best_v


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mt_intersect_pallas(tri_pos, ro, rd, *, interpret: bool = False):
    """Fused-Pallas all-pairs MT intersection; returns `intersect.Hit`.

    Bit-compatible with ops/mt_matmul.mt_intersect up to MXU f32 pass
    rounding (parity-tested).  `interpret=True` runs the kernel in the
    Pallas interpreter for CPU tests.
    """
    R = ro.shape[0]
    N = tri_pos.shape[0]
    if N == 0:
        z = jnp.zeros((R,), jnp.float32)
        return Hit(jnp.zeros((R,), bool), jnp.full((R,), INF),
                   jnp.full((R,), -1, jnp.int32), z, z)

    chunk = min(CHUNK_TRIS, max(8, int(np.ceil(N / 8)) * 8))
    n_pad = int(np.ceil(N / chunk)) * chunk  # zero rows are degenerate: no hit
    r_pad = int(np.ceil(R / TILE_RAYS)) * TILE_RAYS

    cols = triangle_columns(_pad_to(tri_pos, n_pad, 0))  # (10, 4, Np)
    cols_rows = jnp.transpose(cols, (1, 2, 0)).reshape(4 * n_pad, 10)
    phi_t = _pad_to(ray_features(ro, rd).T, r_pad, 1)  # (10, Rp)

    grid = (r_pad // TILE_RAYS,)
    kernel = functools.partial(_kernel, n_tris=n_pad, chunk=chunk)
    out_shape = [
        jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
    ]
    out_spec = pl.BlockSpec((1, TILE_RAYS), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    t, idx, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((10, TILE_RAYS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_pad, 10), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(phi_t, cols_rows)

    t = t[0, :R]
    idx = idx[0, :R]
    hit = idx >= 0
    # padded-triangle indices can never win (degenerate rows are invalid),
    # and padded ray lanes are sliced away here.
    return Hit(hit, t, idx, u[0, :R], v[0, :R])
