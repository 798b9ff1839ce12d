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
        # Validity in multiplied-through form (ts > EPSILON*|a|), exactly as
        # ops/mt_matmul._epilogue: the divided form (ta*f > EPSILON) differs
        # under rounding for borderline-t lanes and broke bit-parity.
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def mt_intersect_pallas2(tri_pos, ro, rd, *, interpret: bool = False):
    """Two-level-culled fused all-pairs MT intersection; returns
    `intersect.Hit`.

    Matches ops/mt_matmul.mt_intersect decisions (hit masks and triangle
    choices; t/u/v to f32 re-association) — parity-tested; on TPU hardware
    near-exact-tie lanes can flip between coplanar triangles (one-ULP
    division rounding, same as the round-2 kernel).  `interpret=True` runs
    the kernel in the Pallas interpreter for CPU tests.
    """
    R = ro.shape[0]
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
    r_pad = int(np.ceil(R / TILE_RAYS)) * TILE_RAYS

    tri_padded = _pad_to(tri_pos, n_pad, 0)
    cols = triangle_columns(tri_padded)  # (10, 4, Np)
    cols_rows = jnp.transpose(cols, (1, 2, 0)).reshape(4 * n_pad, 10)
    boxes = treelet_boxes(tri_padded, chunk)  # (Mc, 8)
    sub_boxes = treelet_boxes(tri_padded, sub)  # (Ms, 8)
    phi = ray_features(ro, rd)
    phi_t = _pad_to(phi.T, r_pad, 1, value=1e30)  # parked padding lanes

    grid = (r_pad // TILE_RAYS,)
    kernel = functools.partial(_kernel, n_tris=n_pad, chunk=chunk, sub=sub)
    vma = getattr(jax.typeof(ro), "vma", None) if hasattr(jax, "typeof") else None
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
    row_spec = pl.BlockSpec((1, TILE_RAYS), lambda i: (0, i),
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
            pltpu.VMEM((n_pad // chunk, TILE_RAYS), jnp.float32),
        ],
        interpret=interpret,
    )(phi_t, cols_rows, boxes, sub_boxes)

    t = t[0, :R]
    idx = idx[0, :R]
    return Hit(idx >= 0, t, idx, u[0, :R], v[0, :R])
