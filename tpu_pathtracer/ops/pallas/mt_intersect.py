"""Fused Pallas TPU kernel for the MXU/VPU Möller–Trumbore intersector.

Same math as ops/mt_matmul.py (the bilinear-form factorization of
raytrace.wgsl:78-116), fused so the pair-determinant intermediates never
leave VMEM, plus a treelet-level culling stage the dense XLA formulation
cannot express.

Measured design decisions (TPU v5e, docs/DESIGN_NOTES.md):

  * The determinant "matmul" has K = 10; the MXU pads K to 128 and HIGHEST
    (6-pass) f32 makes the padding 6x worse — measured 24 ms/call at
    512²x2K.  The coefficient table is structurally sparse (19 of 40
    feature entries are nonzero), so the kernel instead accumulates the
    four determinants as 19 VPU broadcast-fmas per pair: measured
    11.7 ms/call with bit-identical hit/triangle decisions.  Single-pass
    bf16 (DEFAULT precision) is 7.8 ms but numerically unacceptable
    (0.7% wrong hit masks).
  * Treelet culling: triangles are laid out in BVH-DFS leaf order
    (scene compile, scene/host.py), so each CHUNK_TRIS-row chunk is a
    spatially tight treelet.  Per ray tile, a slab test against every
    treelet AABB runs once up front; a chunk is skipped entirely
    (lax.cond) when no ray in the tile can hit its box closer than its
    current best t.  Terminated rays are parked at origin 1e30 by the
    caller (ops/trace.py), so a tile of finished rays skips every chunk —
    tile-granularity wavefront compaction without any sorting.

Layout: rays along LANES (phi_t (10, R) tiled to (10, TR)); triangles
along SUBLANES (coefficient rows (4N, 10), quantity-major blocks
[a | u*a | v*a | t*a]).  Outputs are (1, R) rows (t, tri, u, v) assembled
into an intersect.Hit by the wrapper.  Nearest hit wins; exact-t ties
resolve to the lowest triangle index (brute_force_intersect contract).
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

# Ray-tile (lanes) and treelet/chunk (sublanes) sizes.  TR is a multiple of
# 128 (lane width); CHUNK_TRIS a multiple of 8 (f32 sublanes) and the
# treelet granularity for culling.
TILE_RAYS = 1024
CHUNK_TRIS = 128

_BIG_I32 = np.int32(2**31 - 1)

# Feature indices of phi = [1, ro(1:4), rd(4:7), ro x rd(7:10)] carrying
# nonzero coefficients per determinant (see mt_matmul.triangle_columns).
_FEATS = {0: (4, 5, 6), 1: (4, 5, 6, 7, 8, 9), 2: (4, 5, 6, 7, 8, 9),
          3: (0, 1, 2, 3)}


def _kernel(phi_ref, cols_ref, boxes_ref, t_ref, idx_ref, u_ref, v_ref,
            cull_ref, *, n_tris, chunk):
    """One ray tile vs all triangles.  phi_ref: (10, TR); cols_ref: (4N, 10)
    quantity-major; boxes_ref: (M, 8) treelet [min3 max3 pad2];
    outputs: (1, TR) each; cull_ref: (M, TR) f32 VMEM scratch holding the
    per-treelet conservative entry distance (+inf = box missed) — a scratch
    ref because Mosaic only lowers *ref* dynamic indexing, not value
    dynamic_slice, inside the chunk loop."""
    phi = phi_ref[:]  # (10, TR)
    tr = phi.shape[1]
    n_chunks = n_tris // chunk

    # ---- per-tile treelet culling table: slab-test all M boxes ----------
    # Guarded like intersect.ray_aabb: parallel axes require containment.
    ro = phi[1:4, :]  # (3, TR)
    rd = phi[4:7, :]
    par = jnp.abs(rd) < EPSILON
    inv = jnp.float32(1.0) / jnp.where(par, jnp.float32(1.0), rd)
    bmin = boxes_ref[:, 0:3]  # (M, 3)
    bmax = boxes_ref[:, 3:6]

    # Mirrors intersect.ray_aabb_t: parallel axes require containment and
    # contribute no interval constraint.
    hit_par = jnp.ones((n_chunks, tr), bool)
    tmin_all = jnp.full((n_chunks, tr), -INF, jnp.float32)
    tmax_all = jnp.full((n_chunks, tr), INF, jnp.float32)
    for k in range(3):
        pk = par[k : k + 1, :]  # (1, TR)
        lo = (bmin[:, k : k + 1] - ro[k : k + 1, :]) * inv[k : k + 1, :]
        hi = (bmax[:, k : k + 1] - ro[k : k + 1, :]) * inv[k : k + 1, :]
        tn = jnp.where(pk, -INF, jnp.minimum(lo, hi))
        tf = jnp.where(pk, INF, jnp.maximum(lo, hi))
        inside = (ro[k : k + 1, :] >= bmin[:, k : k + 1]) & (
            ro[k : k + 1, :] <= bmax[:, k : k + 1]
        )
        hit_par &= (~pk) | inside
        tmin_all = jnp.maximum(tmin_all, tn)
        tmax_all = jnp.minimum(tmax_all, tf)
    box_hit = hit_par & (tmax_all >= jnp.maximum(jnp.float32(0.0), tmin_all))
    cull_ref[:] = jnp.where(box_hit, tmin_all, INF)

    def chunk_body(c, best):
        best_t, best_i, best_u, best_v = best
        c0 = c * chunk

        entry = cull_ref[pl.ds(c, 1), :]  # (1, TR)
        any_live = jnp.sum((entry < best_t).astype(jnp.int32)) > 0

        def do(best):
            best_t, best_i, best_u, best_v = best
            rows = [cols_ref[pl.ds(q * n_tris + c0, chunk), :] for q in range(4)]

            def dets(q):
                out = None
                for k in _FEATS[q]:
                    term = rows[q][:, k : k + 1] * phi[k : k + 1, :]
                    out = term if out is None else out + term
                return out  # (C, TR)

            a, ua, va, ta = dets(0), dets(1), dets(2), dets(3)

            abs_a = jnp.abs(a)
            sa = jnp.sign(a)
            us = ua * sa
            vs = va * sa
            f = jnp.float32(1.0) / jnp.where(abs_a >= EPSILON, a, jnp.float32(1.0))
            t_raw = ta * f
            # t > EPSILON directly on the recovered t (equivalent to the
            # sign-multiplied ts > EPSILON*|a| form, one mul cheaper; the
            # abs_a >= EPSILON clause keeps garbage-f lanes invalid)
            valid = (
                (abs_a >= EPSILON)
                & (us >= 0.0)
                & (us <= abs_a)
                & (vs >= 0.0)
                & (us + vs <= abs_a)
                & (t_raw > EPSILON)
            )
            t = jnp.where(valid, t_raw, INF)  # (C, TR)
            tmin = jnp.min(t, axis=0, keepdims=True)  # (1, TR)
            take = tmin < best_t

            def winner(best):
                # Only when some lane improves: recover the winning row's
                # index (lowest-index tie) and its barycentrics.  Most live
                # chunks improve nothing once best_t tightens, so this
                # selection work is usually skipped.
                best_t, best_i, best_u, best_v = best
                rows_i = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + c0
                sel_rows = jnp.where(t == tmin, rows_i, _BIG_I32)
                imin = jnp.min(sel_rows, axis=0, keepdims=True)
                sel = sel_rows == imin
                u_w = jnp.sum(jnp.where(sel, ua * f, 0.0), axis=0, keepdims=True)
                v_w = jnp.sum(jnp.where(sel, va * f, 0.0), axis=0, keepdims=True)
                return (
                    jnp.where(take, tmin, best_t),
                    jnp.where(take, imin, best_i),
                    jnp.where(take, u_w, best_u),
                    jnp.where(take, v_w, best_v),
                )

            any_take = jnp.sum(take.astype(jnp.int32)) > 0
            return jax.lax.cond(any_take, winner, lambda b: b, best)

        return jax.lax.cond(any_live, do, lambda b: b, best)

    # phi-derived zeros taint the literal inits with the rays' value-varying
    # type — only matters when the kernel body is TRACED under shard_map
    # (interpret mode in the sharded CPU tests); compiled TPU kernels see an
    # empty vma and XLA folds the zeros away.
    kzf = phi[0:1, :] * jnp.float32(0.0)
    kzi = kzf.astype(jnp.int32)
    init = (
        jnp.full((1, tr), INF, jnp.float32) + kzf,
        jnp.full((1, tr), -1, jnp.int32) + kzi,
        kzf,
        kzf,
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


def treelet_boxes(tri_pos, chunk: int = CHUNK_TRIS):
    """AABBs of consecutive `chunk`-row treelets: (N, 9) -> (M, 8) f32
    [min3, max3, 0, 0].  Assumes tri_pos rows are spatially ordered
    (scene compile lays them out in BVH-DFS leaf order).  All-zero padding
    rows pull the LAST treelet's box toward the origin — conservative
    (never skips a real hit), only slightly pessimistic for culling."""
    n = tri_pos.shape[0]
    m = -(-n // chunk)
    tp = _pad_to(tri_pos, m * chunk, 0)
    verts = tp.reshape(m, chunk, 3, 3)
    bmin = verts.min(axis=(1, 2))
    bmax = verts.max(axis=(1, 2))
    return jnp.concatenate([bmin, bmax, jnp.zeros((m, 2), tri_pos.dtype)], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mt_intersect_pallas(tri_pos, ro, rd, *, interpret: bool = False):
    """Fused-Pallas all-pairs MT intersection with treelet culling; returns
    `intersect.Hit`.

    Matches ops/mt_matmul.mt_intersect decisions exactly (hit masks and
    triangle choices; t/u/v to f32 re-association) — parity-tested.
    `interpret=True` runs the kernel in the Pallas interpreter for CPU
    tests.
    """
    R = ro.shape[0]
    N = tri_pos.shape[0]
    if N == 0:
        z = jnp.zeros((R,), jnp.float32)
        return Hit(jnp.zeros((R,), bool), jnp.full((R,), INF),
                   jnp.full((R,), -1, jnp.int32), z, z)
    if N > 8192:
        # the coefficient table + double-buffered chunk intermediates
        # exceed VMEM past this (measured: 16K tris -> 17.2 MB vs the 16 MB
        # scoped limit); fail with intent instead of a compiler OOM
        raise ValueError(
            f"mt_pallas holds the whole scene in VMEM and supports <= 8192 "
            f"triangles (got {N}); use intersector='bvh8' (the auto default "
            "for large scenes) or 'mt'"
        )

    chunk = min(CHUNK_TRIS, max(8, int(np.ceil(N / 8)) * 8))
    n_pad = int(np.ceil(N / chunk)) * chunk  # zero rows are degenerate: no hit
    r_pad = int(np.ceil(R / TILE_RAYS)) * TILE_RAYS

    tri_padded = _pad_to(tri_pos, n_pad, 0)
    cols = triangle_columns(tri_padded)  # (10, 4, Np)
    cols_rows = jnp.transpose(cols, (1, 2, 0)).reshape(4 * n_pad, 10)
    boxes = treelet_boxes(tri_padded, chunk)  # (M, 8)
    # Padded ray lanes get origin 1e30: every treelet box test misses and
    # every determinant is invalid, so they do no work and report a miss.
    phi = ray_features(ro, rd)
    phi_t = _pad_to(phi.T, r_pad, 1, value=1e30)  # (10, Rp)

    grid = (r_pad // TILE_RAYS,)
    kernel = functools.partial(_kernel, n_tris=n_pad, chunk=chunk)
    # Under shard_map with check_vma=True, pallas_call outputs must declare
    # their value-varying-axes type explicitly: the hit record varies over
    # exactly the axes the rays vary over.
    vma = getattr(jax.typeof(ro), "vma", None) if hasattr(jax, "typeof") else None
    sds = (functools.partial(jax.ShapeDtypeStruct, vma=vma)
           if vma else jax.ShapeDtypeStruct)
    out_shape = [
        sds((1, r_pad), jnp.float32),
        sds((1, r_pad), jnp.int32),
        sds((1, r_pad), jnp.float32),
        sds((1, r_pad), jnp.float32),
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
            pl.BlockSpec((n_pad // chunk, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_pad // chunk, TILE_RAYS), jnp.float32),
        ],
        interpret=interpret,
    )(phi_t, cols_rows, boxes)

    t = t[0, :R]
    idx = idx[0, :R]
    hit = idx >= 0
    return Hit(hit, t, idx, u[0, :R], v[0, :R])


def _kernel_stream(phi_ref, cols_hbm, boxes_ref, t_ref, idx_ref, u_ref,
                   v_ref, cull_ref, buf_ref, sem_ref, *, chunk, n_chunks):
    """Streamed variant: the whole (n_chunks, 4C, 10) coefficient table
    stays in HBM; the kernel double-buffers chunk blocks into VMEM with
    manual async DMA inside its own fori_loop.  A grid dimension per chunk
    was measured 40x slower (~25 us of grid-step overhead per (tile, chunk)
    vs ~0.5 us for an in-kernel lax.cond — docs/DESIGN_NOTES.md); the DMA
    is unconditional (bandwidth is cheap: the whole table per ray tile),
    the compute is skipped for culled chunks like the whole-scene kernel.
    """
    phi = phi_ref[:]  # (10, TR)
    tr = phi.shape[1]

    # ---- per-tile treelet culling table (same as _kernel) ---------------
    ro = phi[1:4, :]
    rd = phi[4:7, :]
    par = jnp.abs(rd) < EPSILON
    inv = jnp.float32(1.0) / jnp.where(par, jnp.float32(1.0), rd)
    bmin = boxes_ref[:, 0:3]
    bmax = boxes_ref[:, 3:6]
    hit_par = jnp.ones((n_chunks, tr), bool)
    tmin_all = jnp.full((n_chunks, tr), -INF, jnp.float32)
    tmax_all = jnp.full((n_chunks, tr), INF, jnp.float32)
    for k in range(3):
        pk = par[k : k + 1, :]
        lo = (bmin[:, k : k + 1] - ro[k : k + 1, :]) * inv[k : k + 1, :]
        hi = (bmax[:, k : k + 1] - ro[k : k + 1, :]) * inv[k : k + 1, :]
        tn = jnp.where(pk, -INF, jnp.minimum(lo, hi))
        tf = jnp.where(pk, INF, jnp.maximum(lo, hi))
        inside = (ro[k : k + 1, :] >= bmin[:, k : k + 1]) & (
            ro[k : k + 1, :] <= bmax[:, k : k + 1]
        )
        hit_par &= (~pk) | inside
        tmin_all = jnp.maximum(tmin_all, tn)
        tmax_all = jnp.minimum(tmax_all, tf)
    box_hit = hit_par & (tmax_all >= jnp.maximum(jnp.float32(0.0), tmin_all))
    cull_ref[:] = jnp.where(box_hit, tmin_all, INF)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            cols_hbm.at[c], buf_ref.at[slot], sem_ref.at[slot]
        )

    get_dma(0, 0).start()

    def chunk_body(c, best):
        best_t, best_i, best_u, best_v = best
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        get_dma(slot, c).wait()

        entry = cull_ref[pl.ds(c, 1), :]
        any_live = jnp.sum((entry < best_t).astype(jnp.int32)) > 0

        def do(best):
            best_t, best_i, best_u, best_v = best
            rows = buf_ref[slot]  # (4C, 10)

            def dets(q):
                qrows = rows[q * chunk : (q + 1) * chunk, :]
                out = None
                for k in _FEATS[q]:
                    term = qrows[:, k : k + 1] * phi[k : k + 1, :]
                    out = term if out is None else out + term
                return out

            a, ua, va, ta = dets(0), dets(1), dets(2), dets(3)
            abs_a = jnp.abs(a)
            sa = jnp.sign(a)
            us = ua * sa
            vs = va * sa
            f = jnp.float32(1.0) / jnp.where(abs_a >= EPSILON, a, jnp.float32(1.0))
            t_raw = ta * f
            valid = (
                (abs_a >= EPSILON)
                & (us >= 0.0)
                & (us <= abs_a)
                & (vs >= 0.0)
                & (us + vs <= abs_a)
                & (t_raw > EPSILON)
            )
            t = jnp.where(valid, t_raw, INF)
            tmin = jnp.min(t, axis=0, keepdims=True)
            take = tmin < best_t

            def winner(best):
                best_t, best_i, best_u, best_v = best
                rows_i = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + c * chunk
                sel_rows = jnp.where(t == tmin, rows_i, _BIG_I32)
                imin = jnp.min(sel_rows, axis=0, keepdims=True)
                sel = sel_rows == imin
                u_w = jnp.sum(jnp.where(sel, ua * f, 0.0), axis=0, keepdims=True)
                v_w = jnp.sum(jnp.where(sel, va * f, 0.0), axis=0, keepdims=True)
                return (
                    jnp.where(take, tmin, best_t),
                    jnp.where(take, imin, best_i),
                    jnp.where(take, u_w, best_u),
                    jnp.where(take, v_w, best_v),
                )

            any_take = jnp.sum(take.astype(jnp.int32)) > 0
            return jax.lax.cond(any_take, winner, lambda b: b, best)

        return jax.lax.cond(any_live, do, lambda b: b, best)

    kzf = phi[0:1, :] * jnp.float32(0.0)
    kzi = kzf.astype(jnp.int32)
    init = (
        jnp.full((1, tr), INF, jnp.float32) + kzf,
        jnp.full((1, tr), -1, jnp.int32) + kzi,
        kzf,
        kzf,
    )
    best_t, best_i, best_u, best_v = jax.lax.fori_loop(
        0, n_chunks, chunk_body, init
    )
    t_ref[:] = best_t
    idx_ref[:] = best_i
    u_ref[:] = best_u
    v_ref[:] = best_v


# VMEM wall of the whole-scene kernel (measured: 16K tris -> 17.2 MB) and
# the streamed kernel's cull-table scratch cap (M = N/CHUNK_TRIS rows).
MT_PALLAS_MAX_TRIS = 8192
MT_STREAM_MAX_TRIS = 131072


@functools.partial(jax.jit, static_argnames=("interpret",))
def mt_intersect_stream(tri_pos, ro, rd, *, interpret: bool = False):
    """Streamed fused MT intersection for scenes past the whole-scene VMEM
    wall (8K < N <= 128K): triangle coefficient chunks stream from HBM via
    a second grid dimension (Mosaic double-buffers the block DMA) while the
    running best hit lives in the revisited output blocks.  Same math and
    culling as `mt_intersect_pallas`; parity-tested."""
    R = ro.shape[0]
    N = tri_pos.shape[0]
    if N == 0:
        z = jnp.zeros((R,), jnp.float32)
        return Hit(jnp.zeros((R,), bool), jnp.full((R,), INF),
                   jnp.full((R,), -1, jnp.int32), z, z)
    if N > MT_STREAM_MAX_TRIS:
        raise ValueError(
            f"mt_stream's cull table scales with N/{CHUNK_TRIS} and supports "
            f"<= {MT_STREAM_MAX_TRIS} triangles (got {N}); use 'bvh8'"
        )

    chunk = min(CHUNK_TRIS, max(8, int(np.ceil(N / 8)) * 8))
    n_pad = int(np.ceil(N / chunk)) * chunk
    r_pad = int(np.ceil(R / TILE_RAYS)) * TILE_RAYS
    n_chunks = n_pad // chunk

    tri_padded = _pad_to(tri_pos, n_pad, 0)
    cols = triangle_columns(tri_padded)  # (10, 4, Np)
    # chunk-major blocks: (n_chunks, 4C, 10), quantity-major rows per chunk
    cols_chunks = jnp.transpose(
        cols.reshape(10, 4, n_chunks, chunk), (2, 1, 3, 0)
    ).reshape(n_chunks, 4 * chunk, 10)
    boxes = treelet_boxes(tri_padded, chunk)
    phi = ray_features(ro, rd)
    phi_t = _pad_to(phi.T, r_pad, 1, value=1e30)

    vma = getattr(jax.typeof(ro), "vma", None) if hasattr(jax, "typeof") else None
    sds = (functools.partial(jax.ShapeDtypeStruct, vma=vma)
           if vma else jax.ShapeDtypeStruct)
    out_spec = pl.BlockSpec((1, TILE_RAYS), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_stream, chunk=chunk, n_chunks=n_chunks)
    t, idx, u, v = pl.pallas_call(
        kernel,
        grid=(r_pad // TILE_RAYS,),
        in_specs=[
            pl.BlockSpec((10, TILE_RAYS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # cols stay in HBM
            pl.BlockSpec((n_chunks, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=[
            sds((1, r_pad), jnp.float32),
            sds((1, r_pad), jnp.int32),
            sds((1, r_pad), jnp.float32),
            sds((1, r_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_chunks, TILE_RAYS), jnp.float32),
            pltpu.VMEM((2, 4 * chunk, 10), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(phi_t, cols_chunks, boxes)

    t = t[0, :R]
    idx = idx[0, :R]
    return Hit(idx >= 0, t, idx, u[0, :R], v[0, :R])
