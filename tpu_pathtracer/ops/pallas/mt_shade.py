"""Round-3 fused Pallas TPU kernel: Möller–Trumbore intersection with
two-level treelet culling.

Same bilinear-form MT math and decisions as ops/pallas/mt_intersect.py
(reference: src/passes/shaders/raytrace.wgsl:78-116), restructured around
two measured round-3 findings (docs/DESIGN_NOTES.md):

  1. **Two-level culling.** The round-2 kernel culled at 128-triangle
     treelet granularity; measured per-ray box-hit rates at that
     granularity (6.2% primary / 3.9% diffuse on the default scene) are
     4-5x worse than at 32-triangle granularity, but going to 32-triangle
     chunks quadruples the per-(tile, chunk) `lax.cond` count whose fixed
     cost already dominated (1.11 ms/call measured with every ray parked).
     This kernel tests chunk-level slabs first (one cond per 128-triangle
     chunk, as before) and slab-tests the four 32-triangle sub-treelets
     only inside live chunks — dead regions pay one cond, live regions get
     the 4x tighter boxes.
  2. **Mutate state in refs, not cond carries.** Carrying the running best
     state through nested `lax.cond`s materializes a copy of the whole
     carry at every branch boundary (measured 4-12x slowdown when the
     carry grows); the best state lives in the output refs and is updated
     in place under `pl.when`.
  3. **Tile-alive gate**: parked rays (rd = 0, set by the trace loop) make
     a fully-terminated ray tile cost one reduction + one cond instead of
     the full cull table + 16 conds.

Layout: rays along LANES (phi (10, TR)); triangles along SUBLANES
(coefficient rows (4N, 10) quantity-major).  Nearest hit wins; exact-t
ties resolve to the lowest triangle index (brute_force_intersect
contract).  On-TPU decisions match the XLA 'mt' formulation except on
numerically-degenerate near-ties where Mosaic's division rounds one ULP
differently (measured ~0.4% of lanes on coplanar-overlap scenes; identical
behavior to the round-2 kernel).
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
from .mt_intersect import _FEATS, _pad_to, treelet_boxes

TILE_RAYS = 1024
CHUNK_TRIS = 128  # level-1 treelet (one cond per live tile)
SUB_TRIS = 32  # level-2 treelet (conds only inside live chunks)


def _tile_rays(override=None) -> int:
    """Resolve the ray-tile width: explicit override (RenderConfig.tile_rays)
    wins, then the TPT_TILE_RAYS env var (sweep hook, read at trace time —
    changing it after a caller's jitted step compiled has no effect), then
    TILE_RAYS.  Must be a positive multiple of 128 (Mosaic lane alignment)."""
    import os

    value = override if override is not None else int(
        os.environ.get("TPT_TILE_RAYS", str(TILE_RAYS))
    )
    value = int(value)
    if value <= 0 or value % 128:
        raise ValueError(
            f"tile_rays must be a positive multiple of 128, got {value}"
        )
    return value

_BIG_I32 = np.int32(2**31 - 1)


def _slab_entries(boxes, ro, rd, par, inv):
    """Conservative slab entry distances of (K, 8) boxes vs (3, TR) rays:
    returns (K, TR) f32 entry distance, +INF where the box is missed.
    Mirrors intersect.ray_aabb_t: parallel axes require containment."""
    k_boxes = boxes.shape[0]
    tr = ro.shape[1]
    hit_par = jnp.ones((k_boxes, tr), bool)
    tmin_all = jnp.full((k_boxes, tr), -INF, jnp.float32)
    tmax_all = jnp.full((k_boxes, tr), INF, jnp.float32)
    for k in range(3):
        pk = par[k : k + 1, :]
        lo = (boxes[:, k : k + 1] - ro[k : k + 1, :]) * inv[k : k + 1, :]
        hi = (boxes[:, k + 3 : k + 4] - ro[k : k + 1, :]) * inv[k : k + 1, :]
        tn = jnp.where(pk, -INF, jnp.minimum(lo, hi))
        tf = jnp.where(pk, INF, jnp.maximum(lo, hi))
        inside = (ro[k : k + 1, :] >= boxes[:, k : k + 1]) & (
            ro[k : k + 1, :] <= boxes[:, k + 3 : k + 4]
        )
        hit_par &= (~pk) | inside
        tmin_all = jnp.maximum(tmin_all, tn)
        tmax_all = jnp.minimum(tmax_all, tf)
    box_hit = hit_par & (tmax_all >= jnp.maximum(jnp.float32(0.0), tmin_all))
    return jnp.where(box_hit, tmin_all, INF)


def _mt_sub_block(phi, rows, s0, t_ref, idx_ref, u_ref, v_ref):
    """Determinants + epilogue + best-hit update for one sub-treelet block.

    phi: (10, TR); rows: 4x (S, 10) coefficient slices [a|ua|va|ta]; s0:
    global triangle index of row 0.  Validity uses the multiplied-through
    form (ts > EPSILON*|a|), exactly as ops/mt_matmul._epilogue — the
    divided form (ta*f > EPSILON) differs under rounding for borderline-t
    lanes and breaks bit-parity.  The best state lives in the output refs
    and is updated in place under `pl.when` (cond carries copy it)."""

    def dets(q):
        out = None
        for k in _FEATS[q]:
            term = rows[q][:, k : k + 1] * phi[k : k + 1, :]
            out = term if out is None else out + term
        return out  # (S, TR)

    a, ua, va, ta = dets(0), dets(1), dets(2), dets(3)
    abs_a = jnp.abs(a)
    sa = jnp.sign(a)
    us = ua * sa
    vs = va * sa
    ts = ta * sa
    f = jnp.float32(1.0) / jnp.where(abs_a >= EPSILON, a, jnp.float32(1.0))
    valid = (
        (abs_a >= EPSILON)
        & (us >= 0.0)
        & (us <= abs_a)
        & (vs >= 0.0)
        & (us + vs <= abs_a)
        & (ts > EPSILON * abs_a)
    )
    t = jnp.where(valid, ta * f, INF)  # (S, TR)
    tmin = jnp.min(t, axis=0, keepdims=True)
    take = tmin < t_ref[:]
    any_take = jnp.sum(take.astype(jnp.int32)) > 0

    @pl.when(any_take)
    def _winner():
        rows_i = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + s0
        sel_rows = jnp.where(t == tmin, rows_i, _BIG_I32)
        imin = jnp.min(sel_rows, axis=0, keepdims=True)
        sel = sel_rows == imin
        u_w = jnp.sum(jnp.where(sel, ua * f, 0.0), axis=0, keepdims=True)
        v_w = jnp.sum(jnp.where(sel, va * f, 0.0), axis=0, keepdims=True)
        t_ref[:] = jnp.where(take, tmin, t_ref[:])
        idx_ref[:] = jnp.where(take, imin, idx_ref[:])
        u_ref[:] = jnp.where(take, u_w, u_ref[:])
        v_ref[:] = jnp.where(take, v_w, v_ref[:])


def _kernel(phi_ref, cols_ref, boxes_ref, sub_boxes_ref,
            t_ref, idx_ref, u_ref, v_ref, cull_ref, *, n_tris, chunk, sub):
    """One ray tile vs all triangles with two-level culling.

    phi_ref: (10, TR); cols_ref: (4N, 10) quantity-major; boxes_ref:
    (Mc, 8) chunk boxes; sub_boxes_ref: (Ms, 8) sub-treelet boxes; outputs
    (1, TR) x4; cull_ref: (Mc, TR) scratch (dynamic row indexing needs a
    ref)."""
    phi = phi_ref[:]
    tr = phi.shape[1]
    n_chunks = n_tris // chunk
    subs_per_chunk = chunk // sub

    ro = phi[1:4, :]
    rd = phi[4:7, :]
    par = jnp.abs(rd) < EPSILON
    inv = jnp.float32(1.0) / jnp.where(par, jnp.float32(1.0), rd)

    # phi-derived zeros taint the literal inits with the rays' vma type
    # (needed when the body is traced under shard_map; free when compiled).
    kzf = phi[0:1, :] * jnp.float32(0.0)
    t_ref[:] = jnp.full((1, tr), INF, jnp.float32) + kzf
    idx_ref[:] = jnp.full((1, tr), -1, jnp.int32) + kzf.astype(jnp.int32)
    u_ref[:] = kzf
    v_ref[:] = kzf

    def sub_body(s, c0):
        s0 = c0 + s * sub
        rows = [cols_ref[pl.ds(q * n_tris + s0, sub), :] for q in range(4)]
        _mt_sub_block(phi, rows, s0, t_ref, idx_ref, u_ref, v_ref)

    def chunk_body(c, carry):
        c0 = c * chunk
        entry = cull_ref[pl.ds(c, 1), :]  # (1, TR)
        any_live = jnp.sum((entry < t_ref[:]).astype(jnp.int32)) > 0

        @pl.when(any_live)
        def _do():
            sub_boxes = sub_boxes_ref[pl.ds(c * subs_per_chunk, subs_per_chunk), :]
            sub_entry = _slab_entries(sub_boxes, ro, rd, par, inv)
            for s in range(subs_per_chunk):
                live_s = (
                    jnp.sum(
                        (sub_entry[s : s + 1, :] < t_ref[:]).astype(jnp.int32)
                    )
                    > 0
                )
                jax.lax.cond(live_s, lambda s=s: sub_body(s, c0), lambda: None)
        return carry

    # Tile-alive gate: parked rays have rd = 0, so a fully-terminated tile
    # costs one reduction + one cond.
    alive = jnp.sum(jnp.abs(rd)) > 0.0

    @pl.when(alive)
    def _run():
        cull_ref[:] = _slab_entries(boxes_ref[:], ro, rd, par, inv)
        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


# Whole-scene VMEM wall, as the round-2 kernel (measured there: 16K tris ->
# 17.2 MB > the 16 MB scoped limit).
MT_SHADE_MAX_TRIS = 8192


def mt_intersect_pallas2(tri_pos, ro, rd, *, interpret: bool = False):
    """Two-level-culled fused all-pairs MT intersection; returns
    `intersect.Hit`.

    Matches ops/mt_matmul.mt_intersect decisions (hit masks and triangle
    choices; t/u/v to f32 re-association) — parity-tested; on TPU hardware
    near-exact-tie lanes can flip between coplanar triangles (one-ULP
    division rounding, same as the round-2 kernel).  `interpret=True` runs
    the kernel in the Pallas interpreter for CPU tests.
    """
    return mt_intersect_pallas2_phi(
        tri_pos, ray_features(ro, rd).T, interpret=interpret
    )


def mt_intersect_pallas2_phi(tri_pos, phi_t, *, interpret: bool = False,
                             tile_rays=None):
    """`mt_intersect_pallas2` taking the transposed ray-feature matrix
    phi_t (10, R) directly — the fused trace loop keeps ray state
    component-major, so it builds phi without any transpose."""
    return _mt_intersect_pallas2_impl(tri_pos, phi_t, interpret=interpret,
                                      tile_rays=_tile_rays(tile_rays))


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rays"))
def _mt_intersect_pallas2_impl(tri_pos, phi_t, *, interpret: bool,
                               tile_rays: int):
    R = phi_t.shape[1]
    N = tri_pos.shape[0]
    if N == 0:
        z = jnp.zeros((R,), jnp.float32)
        return Hit(jnp.zeros((R,), bool), jnp.full((R,), INF),
                   jnp.full((R,), -1, jnp.int32), z, z)
    if N > MT_SHADE_MAX_TRIS:
        raise ValueError(
            f"mt_pallas holds the whole scene in VMEM and supports <= "
            f"{MT_SHADE_MAX_TRIS} triangles (got {N}); use 'bvh8' or "
            "'mt_stream'"
        )

    # Fixed chunk/sub sizes keep the in-kernel slices provably aligned
    # (Mosaic requirement); tiny scenes just pad to one chunk (padded rows
    # are degenerate — all-zero boxes and dets, never valid).
    chunk = CHUNK_TRIS
    sub = SUB_TRIS
    n_pad = int(np.ceil(N / chunk)) * chunk
    r_pad = int(np.ceil(R / tile_rays)) * tile_rays

    tri_padded = _pad_to(tri_pos, n_pad, 0)
    cols = triangle_columns(tri_padded)  # (10, 4, Np)
    cols_rows = jnp.transpose(cols, (1, 2, 0)).reshape(4 * n_pad, 10)
    boxes = treelet_boxes(tri_padded, chunk)  # (Mc, 8)
    sub_boxes = treelet_boxes(tri_padded, sub)  # (Ms, 8)
    phi_t = _pad_to(phi_t, r_pad, 1, value=1e30)  # parked padding lanes

    grid = (r_pad // tile_rays,)
    kernel = functools.partial(_kernel, n_tris=n_pad, chunk=chunk, sub=sub)
    vma = (getattr(jax.typeof(phi_t), "vma", None)
           if hasattr(jax, "typeof") else None)
    if vma:
        # Under shard_map with check_vma: scene operands are axis-invariant
        # while rays vary, and the traced kernel body's binary ops require
        # matching varying axes — pvary the scene tables up front (free: the
        # data is replicated anyway).
        axes = tuple(vma)
        cols_rows = jax.lax.pcast(cols_rows, axes, to="varying")
        boxes = jax.lax.pcast(boxes, axes, to="varying")
        sub_boxes = jax.lax.pcast(sub_boxes, axes, to="varying")
    sds = (functools.partial(jax.ShapeDtypeStruct, vma=vma)
           if vma else jax.ShapeDtypeStruct)
    row_spec = pl.BlockSpec((1, tile_rays), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    t, idx, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((10, tile_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_pad, 10), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad // chunk, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad // sub, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec] * 4,
        out_shape=[
            sds((1, r_pad), jnp.float32),
            sds((1, r_pad), jnp.int32),
            sds((1, r_pad), jnp.float32),
            sds((1, r_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad // chunk, tile_rays), jnp.float32),
        ],
        interpret=interpret,
    )(phi_t, cols_rows, boxes, sub_boxes)

    t = t[0, :R]
    idx = idx[0, :R]
    return Hit(idx >= 0, t, idx, u[0, :R], v[0, :R])


# ---------------------------------------------------------------------------
# HBM-streamed variant for scenes past the whole-scene VMEM wall.
# ---------------------------------------------------------------------------

CHUNKS_PER_SUPER = 16  # super-treelet = 2048 triangles

# HBM coefficient-table size (64 KB per 128-triangle chunk) + box-table
# VMEM budget cap the streamed kernel.
MT_STREAM2_MAX_TRIS = 262144


def _kernel_stream2(phi_ref, cols_hbm, super_boxes_ref, chunk_boxes_ref,
                    sub_boxes_ref, t_ref, idx_ref, u_ref, v_ref,
                    sup_cull_ref, buf_ref, sem_ref,
                    *, chunk, sub, cps, n_supers):
    """Streamed two-level-culled MT: the coefficient table stays in HBM
    ((n_chunks, 4*chunk, 10) blocks); per ray tile a super-treelet slab
    table (cull granularity: 2048 triangles) gates chunk-level slabs, and
    only chunks some ray can still hit are DMA'd into VMEM and intersected.
    The round-2 streamed kernel DMA'd every chunk unconditionally and lost
    to the gather traversal at 32K+ (docs/DESIGN_NOTES.md); conditional DMA
    plus sorted-ray tiles turn the stream cost from O(N) into
    O(live chunks)."""
    phi = phi_ref[:]
    tr = phi.shape[1]

    ro = phi[1:4, :]
    rd = phi[4:7, :]
    par = jnp.abs(rd) < EPSILON
    inv = jnp.float32(1.0) / jnp.where(par, jnp.float32(1.0), rd)

    kzf = phi[0:1, :] * jnp.float32(0.0)
    t_ref[:] = jnp.full((1, tr), INF, jnp.float32) + kzf
    idx_ref[:] = jnp.full((1, tr), -1, jnp.int32) + kzf.astype(jnp.int32)
    u_ref[:] = kzf
    v_ref[:] = kzf

    subs_per_chunk = chunk // sub

    def process_chunk(c):
        """DMA chunk c's coefficient block, then intersect its sub-blocks.

        Block layout is (chunk, 128): triangle rows on sublanes, the four
        quantities' 10 features packed along the first 40 lanes — HBM
        memref slices must be 128-aligned in the lane dim (Mosaic), so the
        block is DMA'd whole and sliced as a value."""
        dma = pltpu.make_async_copy(cols_hbm.at[c], buf_ref.at[0],
                                    sem_ref.at[0])
        dma.start()
        sub_boxes = sub_boxes_ref[pl.ds(c * subs_per_chunk, subs_per_chunk), :]
        sub_entry = _slab_entries(sub_boxes, ro, rd, par, inv)
        dma.wait()
        blk = buf_ref[0]  # (chunk, 128)
        c0 = c * chunk
        for s in range(subs_per_chunk):
            live_s = (
                jnp.sum((sub_entry[s : s + 1, :] < t_ref[:]).astype(jnp.int32))
                > 0
            )

            def do_sub(s=s):
                rows = [blk[s * sub : (s + 1) * sub, q * 10 : (q + 1) * 10]
                        for q in range(4)]
                _mt_sub_block(phi, rows, c0 + s * sub,
                              t_ref, idx_ref, u_ref, v_ref)

            jax.lax.cond(live_s, do_sub, lambda: None)

    def super_body(si, carry):
        entry = sup_cull_ref[pl.ds(si, 1), :]
        any_live = jnp.sum((entry < t_ref[:]).astype(jnp.int32)) > 0

        @pl.when(any_live)
        def _do():
            cboxes = chunk_boxes_ref[pl.ds(si * cps, cps), :]
            centry = _slab_entries(cboxes, ro, rd, par, inv)
            for j in range(cps):
                live_c = (
                    jnp.sum((centry[j : j + 1, :] < t_ref[:]).astype(jnp.int32))
                    > 0
                )
                jax.lax.cond(
                    live_c, lambda j=j: process_chunk(si * cps + j),
                    lambda: None,
                )
        return carry

    alive = jnp.sum(jnp.abs(rd)) > 0.0

    @pl.when(alive)
    def _run():
        sup_cull_ref[:] = _slab_entries(super_boxes_ref[:], ro, rd, par, inv)
        jax.lax.fori_loop(0, n_supers, super_body, 0)


def _dead_pad_boxes(boxes, n_real, granule):
    """Force fully-padding treelet boxes to an impossible box so the slab
    test always misses them (treelet_boxes pads toward the origin, which a
    ray through the origin region would 'hit')."""
    m = boxes.shape[0]
    first_dead = -(-n_real // granule)
    if first_dead >= m:
        return boxes
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    dead = row >= first_dead
    impossible = jnp.concatenate(
        [jnp.full((1, 3), INF), jnp.full((1, 3), -INF), jnp.zeros((1, 2))],
        axis=1,
    )
    return jnp.where(dead, impossible, boxes)


def mt_intersect_stream2(tri_pos, ro, rd, *, interpret: bool = False):
    """Streamed two-level-culled MT intersection for scenes past the
    whole-scene VMEM wall; returns `intersect.Hit`.  Same decisions as
    `mt_intersect_pallas2` (shared sub-block epilogue)."""
    return mt_intersect_stream2_phi(
        tri_pos, ray_features(ro, rd).T, interpret=interpret
    )


def mt_intersect_stream2_phi(tri_pos, phi_t, *, interpret: bool = False,
                             tile_rays=None):
    """`mt_intersect_stream2` taking the transposed ray-feature matrix
    phi_t (10, R) directly (see mt_intersect_pallas2_phi)."""
    return _mt_intersect_stream2_impl(tri_pos, phi_t, interpret=interpret,
                                      tile_rays=_tile_rays(tile_rays))


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rays"))
def _mt_intersect_stream2_impl(tri_pos, phi_t, *, interpret: bool,
                               tile_rays: int):
    R = phi_t.shape[1]
    N = tri_pos.shape[0]
    if N == 0:
        z = jnp.zeros((R,), jnp.float32)
        return Hit(jnp.zeros((R,), bool), jnp.full((R,), INF),
                   jnp.full((R,), -1, jnp.int32), z, z)
    if N > MT_STREAM2_MAX_TRIS:
        raise ValueError(
            f"mt_stream supports <= {MT_STREAM2_MAX_TRIS} triangles "
            f"(got {N}); use 'bvh8'"
        )

    chunk = CHUNK_TRIS
    sub = SUB_TRIS
    cps = CHUNKS_PER_SUPER
    sup = chunk * cps
    n_pad = int(np.ceil(N / sup)) * sup
    n_chunks = n_pad // chunk
    n_supers = n_pad // sup
    r_pad = int(np.ceil(R / tile_rays)) * tile_rays

    tri_padded = _pad_to(tri_pos, n_pad, 0)
    cols = triangle_columns(tri_padded)  # (10, 4, Np)
    # chunk-major HBM blocks (n_chunks, chunk, 128): triangle rows on
    # sublanes, [a|ua|va|ta] x 10 features packed along the first 40 lanes
    # (Mosaic requires 128-aligned lane slices for the per-chunk DMA).
    cols_chunks = _pad_to(
        jnp.transpose(cols.reshape(10, 4, n_chunks, chunk), (2, 3, 1, 0))
        .reshape(n_chunks, chunk, 40),
        128, 2,
    )
    super_boxes = _dead_pad_boxes(treelet_boxes(tri_padded, sup), N, sup)
    chunk_boxes = _dead_pad_boxes(treelet_boxes(tri_padded, chunk), N, chunk)
    sub_boxes = _dead_pad_boxes(treelet_boxes(tri_padded, sub), N, sub)
    phi_t = _pad_to(phi_t, r_pad, 1, value=1e30)

    grid = (r_pad // tile_rays,)
    kernel = functools.partial(_kernel_stream2, chunk=chunk, sub=sub,
                               cps=cps, n_supers=n_supers)
    vma = (getattr(jax.typeof(phi_t), "vma", None)
           if hasattr(jax, "typeof") else None)
    if vma:
        axes = tuple(vma)
        cols_chunks = jax.lax.pcast(cols_chunks, axes, to="varying")
        super_boxes = jax.lax.pcast(super_boxes, axes, to="varying")
        chunk_boxes = jax.lax.pcast(chunk_boxes, axes, to="varying")
        sub_boxes = jax.lax.pcast(sub_boxes, axes, to="varying")
    sds = (functools.partial(jax.ShapeDtypeStruct, vma=vma)
           if vma else jax.ShapeDtypeStruct)
    row_spec = pl.BlockSpec((1, tile_rays), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    t, idx, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((10, tile_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # coefficient blocks: HBM
            pl.BlockSpec((n_supers, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad // sub, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec] * 4,
        out_shape=[
            sds((1, r_pad), jnp.float32),
            sds((1, r_pad), jnp.int32),
            sds((1, r_pad), jnp.float32),
            sds((1, r_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_supers, tile_rays), jnp.float32),
            pltpu.VMEM((1, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(phi_t, cols_chunks, super_boxes, chunk_boxes, sub_boxes)

    t = t[0, :R]
    idx = idx[0, :R]
    return Hit(idx >= 0, t, idx, u[0, :R], v[0, :R])
