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

TILE_RAYS = 512  # measured optimum with the nf list kernel (round 4)
CHUNK_TRIS = 128  # level-1 treelet (one cond per live tile, cond kernel)
SUB_TRIS = 32  # level-2 treelet / list granule


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
    global triangle index of row 0.  Determinants are VPU term loops over
    the nonzero features (_FEATS)."""
    def dets(q):
        out = None
        for k in _FEATS[q]:
            term = rows[q][:, k : k + 1] * phi[k : k + 1, :]
            out = term if out is None else out + term
        return out  # (S, TR)

    _mt_epilogue(dets(0), dets(1), dets(2), dets(3), s0,
                 t_ref, idx_ref, u_ref, v_ref)


def _mt_mxu_block(phi, blk, s0, t_ref, idx_ref, u_ref, v_ref):
    """MXU variant: the four determinant quantities of one sub-treelet are
    ONE matmul.  blk: (4S, 10) block-major coefficient rows
    [a(S); ua(S); va(S); ta(S)]; the (4S, 10) @ (10, TR) contraction runs
    on the systolic array at f32 (HIGHEST = bf16 multi-pass) instead of
    ~19 sequential VPU broadcast-FMA chains.  Zero-coefficient features
    contribute exact zeros, so values match the term-loop up to dot
    re-association ULPs (decisions identical except near-ties, the same
    caveat the compiled kernel already carries vs the XLA 'mt' path)."""
    s = blk.shape[0] // 4
    d = jax.lax.dot_general(
        blk, phi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (4S, TR)
    _mt_epilogue(d[0:s], d[s:2 * s], d[2 * s:3 * s], d[3 * s:4 * s], s0,
                 t_ref, idx_ref, u_ref, v_ref)


def _mt_epilogue(a, ua, va, ta, s0, t_ref, idx_ref, u_ref, v_ref):
    """Validity + best-hit update for one (S, TR) determinant block.
    Validity uses the multiplied-through form (ts > EPSILON*|a|), exactly
    as ops/mt_matmul._epilogue — the divided form (ta*f > EPSILON) differs
    under rounding for borderline-t lanes and breaks bit-parity.  The best
    state lives in the output refs and is updated in place under `pl.when`
    (cond carries copy it)."""
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
    rows_i = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + s0
    sel_rows = jnp.where(t == tmin, rows_i, _BIG_I32)
    imin = jnp.min(sel_rows, axis=0, keepdims=True)
    # Exact-t ties resolve to the LOWEST triangle index regardless of block
    # processing order (brute_force_intersect contract): the equality
    # clause is a no-op when blocks arrive in ascending index order (imin
    # is then always > idx_ref on a tie) but restores the contract for the
    # near-to-far kernel, which visits blocks by entry distance.
    cur = t_ref[:]
    take = (tmin < cur) | ((tmin == cur) & (tmin < INF) & (imin < idx_ref[:]))
    any_take = jnp.sum(take.astype(jnp.int32)) > 0

    @pl.when(any_take)
    def _winner():
        sel = sel_rows == imin
        u_w = jnp.sum(jnp.where(sel, ua * f, 0.0), axis=0, keepdims=True)
        v_w = jnp.sum(jnp.where(sel, va * f, 0.0), axis=0, keepdims=True)
        t_ref[:] = jnp.where(take, tmin, t_ref[:])
        idx_ref[:] = jnp.where(take, imin, idx_ref[:])
        u_ref[:] = jnp.where(take, u_w, u_ref[:])
        v_ref[:] = jnp.where(take, v_w, v_ref[:])


def _kernel(phi_ref, cols_ref, boxes_ref, sub_boxes_ref,
            t_ref, idx_ref, u_ref, v_ref, cull_ref,
            *, n_tris, chunk, sub, mxu):
    """One ray tile vs all triangles with two-level culling.

    phi_ref: (10, TR); cols_ref: (4N, 10) sub-block-major — row
    b*4*sub + q*sub + i holds quantity q of triangle b*sub + i, so one
    (4*sub, 10) slice per sub-treelet feeds either the VPU term loop or
    one MXU matmul (`mxu`); boxes_ref: (Mc, 8) chunk boxes; sub_boxes_ref:
    (Ms, 8) sub-treelet boxes (when sub == chunk the level collapses and
    chunk culling gates the blocks directly); outputs (1, TR) x4;
    cull_ref: (Mc, TR) scratch (dynamic row indexing needs a ref)."""
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
        base = (s0 // sub) * 4 * sub
        if mxu:
            blk = cols_ref[pl.ds(base, 4 * sub), :]
            _mt_mxu_block(phi, blk, s0, t_ref, idx_ref, u_ref, v_ref)
        else:
            rows = [cols_ref[pl.ds(base + q * sub, sub), :] for q in range(4)]
            _mt_sub_block(phi, rows, s0, t_ref, idx_ref, u_ref, v_ref)

    def chunk_body(c, carry):
        c0 = c * chunk
        entry = cull_ref[pl.ds(c, 1), :]  # (1, TR)
        any_live = jnp.sum((entry < t_ref[:]).astype(jnp.int32)) > 0

        @pl.when(any_live)
        def _do():
            if subs_per_chunk == 1:
                sub_body(0, c0)  # chunk == sub: chunk cull already gated us
                return
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


def _kernel_list(count_ref, list_ref, phi_ref, cols_ref,
                 t_ref, idx_ref, u_ref, v_ref, *, sub, mxu):
    """Precull-list variant: zero in-kernel culling.

    The per-tile live sub-treelet LIST is computed outside the kernel
    (`_precull_live_subs`: the same per-ray slab test the cond kernel ran
    in-VMEM, reduced per tile) and arrives in SMEM; the kernel runs one
    dynamic-trip fori_loop over exactly the live blocks.  This deletes the
    per-chunk/per-sub `lax.cond`s and their (1, TR) vector-reduction
    guards, which dominated the cond kernel's cost at low liveness
    (measured 7.4 us/tile vs <1 us of determinant+epilogue work on the
    headline primary bounce — examples/instrument_liveness.py).  The
    trade: no progressive best-t pruning (the precull uses t = inf);
    liveness numbers show that prunes nothing on in-scope scenes.

    count_ref: (T, 1) SMEM (whole array; indexed by program_id — tiled
    SMEM blocks trip the Pallas block-alignment check); list_ref: (T, Ms)
    SMEM live sub indices (ascending; entries past count are undefined);
    phi_ref: (10, TR); cols_ref: (4N, 10) sub-block-major."""
    phi = phi_ref[:]
    tr = phi.shape[1]
    tile = pl.program_id(0)

    kzf = phi[0:1, :] * jnp.float32(0.0)
    t_ref[:] = jnp.full((1, tr), INF, jnp.float32) + kzf
    idx_ref[:] = jnp.full((1, tr), -1, jnp.int32) + kzf.astype(jnp.int32)
    u_ref[:] = kzf
    v_ref[:] = kzf

    def body(j, carry):
        s = list_ref[tile, j]
        base = pl.multiple_of(s * (4 * sub), 4 * sub)
        if mxu:
            blk = cols_ref[pl.ds(base, 4 * sub), :]
            _mt_mxu_block(phi, blk, s * sub, t_ref, idx_ref, u_ref, v_ref)
        else:
            rows = [cols_ref[pl.ds(base + q * sub, sub), :] for q in range(4)]
            _mt_sub_block(phi, rows, s * sub, t_ref, idx_ref, u_ref, v_ref)
        return carry

    jax.lax.fori_loop(0, count_ref[tile, 0], body, 0)


def _parked_lanes(rd):
    """Lanes that must never take a hit: parked rays (rd = 0, set by the
    trace loop when a ray terminates) and _pad_to padding lanes
    (rd = 1e30).  Both are excluded from the near-to-far tmax bound via a
    -INF t init; without the padding test the last partial ray tile kept
    tmax = INF and degraded to unordered-list behaviour (ADVICE r4)."""
    return ((jnp.abs(rd[0:1, :]) + jnp.abs(rd[1:2, :])
             + jnp.abs(rd[2:3, :])) == 0.0) | (jnp.abs(rd[0:1, :]) >= 1e30)


def _kernel_nf(count_ref, list_ref, emin_ref, phi_ref, cols_ref,
               t_ref, idx_ref, u_ref, v_ref, *, sub, mxu):
    """Near-to-far list variant: tile-granular front-to-back traversal.

    Like `_kernel_list`, but the precull orders each tile's live subs by
    ascending per-tile entry distance and ships the distances along; the
    kernel walks the list in that order and BREAKS once the next entry
    exceeds the tile's worst live hit (a scalar compare against SMEM — no
    per-sub vector reductions).  This restores the progressive best-t
    pruning the cond kernel got from its `entry < t_ref` guards, without
    paying a vector reduce+cond per *candidate*: one max-reduce per
    *evaluated* sub maintains the scalar bound.

    Parked lanes (rd = 0, set by the trace loop) and padding lanes
    (phi = 1e30, appended by _pad_to) are excluded from the bound by
    initializing their t to -INF: they can never take a hit (take needs
    tmin < t_ref), and a tile of only parked/padding lanes has
    tmax = -INF so the walk breaks immediately.  The caller only reads t
    where idx >= 0, so the -INF sentinel never escapes (Hit.t is INF on
    miss by contract of the caller's jnp.where on idx)."""
    phi = phi_ref[:]
    tr = phi.shape[1]
    tile = pl.program_id(0)

    rd = phi[4:7, :]
    parked = _parked_lanes(rd)

    kzf = phi[0:1, :] * jnp.float32(0.0)
    t_ref[:] = jnp.where(parked, -INF, INF) + kzf
    idx_ref[:] = jnp.full((1, tr), -1, jnp.int32) + kzf.astype(jnp.int32)
    u_ref[:] = kzf
    v_ref[:] = kzf

    def cond(state):
        # Clamp j for the entry-distance read: `&` does not short-circuit,
        # so at j == count == Ms the unclamped index would read one row
        # past the SMEM array (result discarded, but still OOB).
        j, tmax = state
        jc = jnp.minimum(j, emin_ref.shape[1] - 1)
        return (j < count_ref[tile, 0]) & (emin_ref[tile, jc] < tmax)

    def body(state):
        j, tmax = state
        s = list_ref[tile, j]
        base = pl.multiple_of(s * (4 * sub), 4 * sub)
        if mxu:
            blk = cols_ref[pl.ds(base, 4 * sub), :]
            _mt_mxu_block(phi, blk, s * sub, t_ref, idx_ref, u_ref, v_ref)
        else:
            rows = [cols_ref[pl.ds(base + q * sub, sub), :] for q in range(4)]
            _mt_sub_block(phi, rows, s * sub, t_ref, idx_ref, u_ref, v_ref)
        return j + 1, jnp.max(t_ref[:])

    jax.lax.while_loop(cond, body, (jnp.int32(0), INF))


def _precull_live_subs(sub_boxes, phi_t, tile_rays: int):
    """Exact per-ray slab precull, reduced to per-tile live sub lists.

    sub_boxes: (Ms, 8); phi_t: (10, R) PADDED to a tile multiple (parked
    lanes have rd = 0 and never hit a box).  Returns (counts (T, 1) i32,
    lists (T, Ms) i32, emins (T, Ms) f32): lists[t, :counts[t]] are the
    live sub indices for ray tile t, ordered by ascending per-tile entry
    distance (index order only where sort-stability breaks exact-distance
    ties); emins carries the matching distances for the kernel's scalar
    early-break.  Runs as plain XLA (fused VPU work + small sorts) —
    identical liveness to the cond kernel's INF-best-t guards."""
    ms = sub_boxes.shape[0]
    r = phi_t.shape[1]
    ro = phi_t[1:4, :]
    rd = phi_t[4:7, :]
    par = jnp.abs(rd) < EPSILON
    inv = jnp.float32(1.0) / jnp.where(par, jnp.float32(1.0), rd)
    entry = _slab_entries(sub_boxes, ro, rd, par, inv)  # (Ms, R)
    emin = jnp.min(entry.reshape(ms, r // tile_rays, tile_rays), axis=-1)
    live = emin < INF  # (Ms, T)
    counts = jnp.sum(live.astype(jnp.int32), axis=0)[:, None]  # (T, 1)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, live.shape, 0)
    # near-to-far: sort by per-tile min entry distance (INF = dead filler
    # sinks to the tail); ids ride along.  Also serves the unordered list
    # kernel (any order is correct there).
    emins, lists = jax.lax.sort((emin, sub_ids), dimension=0, num_keys=1)
    return counts, lists.T, emins.T  # (T, 1), (T, Ms), (T, Ms)


# Whole-scene VMEM wall, as the round-2 kernel (measured there: 16K tris ->
# 17.2 MB > the 16 MB scoped limit).
MT_SHADE_MAX_TRIS = 8192


def _mxu_dets(override=None) -> bool:
    """Resolve the MXU-determinant toggle: explicit override, then the
    TPT_MXU_DETS env var (sweep hook, read at trace time), then False.

    The round-5 in-frame sweep settled this: the VPU 19-term loop beats
    the (4·sub, 10) @ (10, TR) matmul by 0.8 ms/frame on the headline
    shape (TPT_MXU_DETS=0 → 10.03, 1 → 10.84 ms device) — K = 10 of 128
    wastes the systolic array and f32-faithful precision multiplies the
    passes.  K is the MT feature dimension, so it cannot grow without
    reformulating the intersection math; batching more sub-treelets per
    issue raises M (already 128), not K (docs/DESIGN_NOTES.md round 5).
    The matmul variant stays sweepable and is numerically identical."""
    import os

    if override is not None:
        return bool(override)
    return os.environ.get("TPT_MXU_DETS", "0") not in ("0", "false", "")


def _pack_subblock_major(cols, sub: int):
    """(10, 4, Np) coefficient tensor -> (4*Np, 10) sub-block-major rows:
    row b*4*sub + q*sub + i = quantity q of triangle b*sub + i.  One
    contiguous (4*sub, 10) slice per sub-treelet serves both the VPU term
    loop and the MXU matmul."""
    n = cols.shape[2]
    qs = jnp.transpose(cols, (1, 2, 0))  # (4, Np, 10)
    return (
        qs.reshape(4, n // sub, sub, 10)
        .transpose(1, 0, 2, 3)
        .reshape(4 * n, 10)
    )


def mt_intersect_pallas2(tri_pos, ro, rd, *, interpret: bool = False,
                         mxu_dets=None, cull=None):
    """Two-level-culled fused all-pairs MT intersection; returns
    `intersect.Hit`.

    Matches ops/mt_matmul.mt_intersect decisions (hit masks and triangle
    choices; t/u/v to f32 re-association) — parity-tested; on TPU hardware
    near-exact-tie lanes can flip between coplanar triangles (one-ULP
    division rounding, same as the round-2 kernel).  `interpret=True` runs
    the kernel in the Pallas interpreter for CPU tests.
    """
    return mt_intersect_pallas2_phi(
        tri_pos, ray_features(ro, rd).T, interpret=interpret,
        mxu_dets=mxu_dets, cull=cull,
    )


def _cull_mode(override=None) -> str:
    """Resolve the culling strategy: 'nf' (XLA precull -> per-tile live
    sub lists ordered near-to-far in SMEM, scalar early-break), 'list'
    (same lists, no distance ordering or break) or 'cond' (in-kernel
    two-level slab tests with lax.cond gates).  Override, then the
    TPT_CULL env var (sweep hook), then 'nf' (measured default)."""
    import os

    value = override if override is not None else os.environ.get(
        "TPT_CULL", "nf"
    )
    if value not in ("nf", "list", "cond"):
        raise ValueError(f"cull must be 'nf', 'list' or 'cond', got {value!r}")
    return value


def _sub_tris(override=None) -> int:
    """Resolve the VMEM (nf/list/cond) kernel's sub-treelet granule:
    override, then TPT_SUB env var (sweep hook), then 64.  Must be a
    positive multiple of 8 that divides CHUNK_TRIS.

    Round-5 headline sweep with the VPU determinant default (ms/frame
    device): 16 → 10.99, 32 → 10.03, **64 → 9.78**, 128 → 10.31 — the
    coarser granule amortizes the per-sub loop overhead better than the
    finer culling saves, up to 64.  The HBM-streamed kernel keeps its own
    granule (SUB_TRIS, hardcoded in _mt_intersect_stream2_impl) — this
    default was swept on the VMEM kernel only."""
    import os

    value = int(override if override is not None
                else os.environ.get("TPT_SUB", "64"))
    if value <= 0 or value % 8 or CHUNK_TRIS % value:
        raise ValueError(
            f"sub must be a positive multiple of 8 dividing {CHUNK_TRIS}, "
            f"got {value}"
        )
    return value


def mt_intersect_pallas2_phi(tri_pos, phi_t, *, interpret: bool = False,
                             tile_rays=None, mxu_dets=None, cull=None,
                             sub=None):
    """`mt_intersect_pallas2` taking the transposed ray-feature matrix
    phi_t (10, R) directly — the fused trace loop keeps ray state
    component-major, so it builds phi without any transpose."""
    return _mt_intersect_pallas2_impl(tri_pos, phi_t, interpret=interpret,
                                      tile_rays=_tile_rays(tile_rays),
                                      mxu=_mxu_dets(mxu_dets),
                                      cull=_cull_mode(cull),
                                      sub=_sub_tris(sub))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_rays", "mxu", "cull",
                                    "sub"))
def _mt_intersect_pallas2_impl(tri_pos, phi_t, *, interpret: bool,
                               tile_rays: int, mxu: bool = False,
                               cull: str = "cond", sub: int = SUB_TRIS):
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
    n_pad = int(np.ceil(N / chunk)) * chunk
    if cull in ("list", "nf"):
        # The per-tile live lists (+ entry distances for 'nf') live in SMEM
        # (~1 MB): cap the tile count at 512 by widening tiles on large ray
        # batches (1080p = 1M rays would otherwise need 3 MB of lists).
        while -(-R // tile_rays) > 512:
            tile_rays *= 2
    r_pad = int(np.ceil(R / tile_rays)) * tile_rays

    tri_padded = _pad_to(tri_pos, n_pad, 0)
    cols = triangle_columns(tri_padded)  # (10, 4, Np)
    cols_rows = _pack_subblock_major(cols, sub)
    boxes = treelet_boxes(tri_padded, chunk)  # (Mc, 8)
    sub_boxes = treelet_boxes(tri_padded, sub)  # (Ms, 8)
    phi_t = _pad_to(phi_t, r_pad, 1, value=1e30)  # parked padding lanes

    grid = (r_pad // tile_rays,)
    n_subs = n_pad // sub
    vma = (getattr(jax.typeof(phi_t), "vma", None)
           if hasattr(jax, "typeof") else None)
    sds = (functools.partial(jax.ShapeDtypeStruct, vma=vma)
           if vma else jax.ShapeDtypeStruct)
    row_spec = pl.BlockSpec((1, tile_rays), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = [
        sds((1, r_pad), jnp.float32),
        sds((1, r_pad), jnp.int32),
        sds((1, r_pad), jnp.float32),
        sds((1, r_pad), jnp.float32),
    ]
    if cull in ("list", "nf"):
        counts, lists, emins = _precull_live_subs(sub_boxes, phi_t, tile_rays)
        if vma:
            axes = tuple(vma)
            cols_rows = jax.lax.pcast(cols_rows, axes, to="varying")
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        ray_spec = pl.BlockSpec((10, tile_rays), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        cols_spec = pl.BlockSpec((4 * n_pad, 10), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        if cull == "nf":
            kernel = functools.partial(_kernel_nf, sub=sub, mxu=mxu)
            in_specs = [smem, smem, smem, ray_spec, cols_spec]
            args = (counts, lists, emins, phi_t, cols_rows)
        else:
            kernel = functools.partial(_kernel_list, sub=sub, mxu=mxu)
            in_specs = [smem, smem, ray_spec, cols_spec]
            args = (counts, lists, phi_t, cols_rows)
        t, idx, u, v = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[row_spec] * 4,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    else:
        kernel = functools.partial(_kernel, n_tris=n_pad, chunk=chunk,
                                   sub=sub, mxu=mxu)
        if vma:
            # Under shard_map with check_vma: scene operands are axis-
            # invariant while rays vary, and the traced kernel body's binary
            # ops require matching varying axes — pvary the scene tables up
            # front (free: the data is replicated anyway).
            axes = tuple(vma)
            cols_rows = jax.lax.pcast(cols_rows, axes, to="varying")
            boxes = jax.lax.pcast(boxes, axes, to="varying")
            sub_boxes = jax.lax.pcast(sub_boxes, axes, to="varying")
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
            out_shape=out_shape,
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


def _kernel_stream2(count_ref, list_ref, emin_ref, phi_ref, cols_hbm,
                    chunk_boxes_ref, sub_boxes_ref,
                    t_ref, idx_ref, u_ref, v_ref, buf_ref, sem_ref,
                    *, chunk, sub, cps):
    """Streamed two-level-culled MT: the coefficient table stays in HBM
    ((n_chunks, 4*chunk, 10) blocks); per ray tile the XLA precull ships a
    near-to-far SMEM list of live SUPER-treelets (2048-triangle granules),
    the kernel walks it with a scalar early-break (as `_kernel_nf`), and
    inside a live super only chunks some ray can still hit are DMA'd into
    VMEM and intersected.  The round-2 streamed kernel DMA'd every chunk
    unconditionally and lost to the gather traversal at 32K+
    (docs/DESIGN_NOTES.md); round 3 added conditional DMA behind in-kernel
    super guards; round 4 replaces the ~n_supers vector-reduce+cond guards
    per tile with the precomputed list (the guards cost ~0.3 us each —
    ~50/tile at 100K triangles)."""
    phi = phi_ref[:]
    tr = phi.shape[1]
    tile = pl.program_id(0)

    ro = phi[1:4, :]
    rd = phi[4:7, :]
    par = jnp.abs(rd) < EPSILON
    inv = jnp.float32(1.0) / jnp.where(par, jnp.float32(1.0), rd)

    parked = _parked_lanes(rd)

    kzf = phi[0:1, :] * jnp.float32(0.0)
    t_ref[:] = jnp.where(parked, -INF, INF) + kzf
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

    def cond(state):
        # Clamped index: see _kernel_nf's cond (`&` does not short-circuit).
        j, tmax = state
        jc = jnp.minimum(j, emin_ref.shape[1] - 1)
        return (j < count_ref[tile, 0]) & (emin_ref[tile, jc] < tmax)

    def body(state):
        j, tmax = state
        si = list_ref[tile, j]
        cboxes = chunk_boxes_ref[pl.ds(si * cps, cps), :]
        centry = _slab_entries(cboxes, ro, rd, par, inv)
        for k in range(cps):
            live_c = (
                jnp.sum((centry[k : k + 1, :] < t_ref[:]).astype(jnp.int32))
                > 0
            )
            jax.lax.cond(
                live_c, lambda k=k: process_chunk(si * cps + k),
                lambda: None,
            )
        return j + 1, jnp.max(t_ref[:])

    jax.lax.while_loop(cond, body, (jnp.int32(0), INF))


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
    # per-tile live-super lists live in SMEM (~1 MB): cap the tile count
    while -(-R // tile_rays) > 512:
        tile_rays *= 2
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
                               cps=cps)
    counts, lists, emins = _precull_live_subs(super_boxes, phi_t, tile_rays)
    vma = (getattr(jax.typeof(phi_t), "vma", None)
           if hasattr(jax, "typeof") else None)
    if vma:
        axes = tuple(vma)
        cols_chunks = jax.lax.pcast(cols_chunks, axes, to="varying")
        chunk_boxes = jax.lax.pcast(chunk_boxes, axes, to="varying")
        sub_boxes = jax.lax.pcast(sub_boxes, axes, to="varying")
    sds = (functools.partial(jax.ShapeDtypeStruct, vma=vma)
           if vma else jax.ShapeDtypeStruct)
    row_spec = pl.BlockSpec((1, tile_rays), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    t, idx, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem, smem, smem,
            pl.BlockSpec((10, tile_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # coefficient blocks: HBM
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
            pltpu.VMEM((1, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(counts, lists, emins, phi_t, cols_chunks, chunk_boxes, sub_boxes)

    t = t[0, :R]
    idx = idx[0, :R]
    return Hit(idx >= 0, t, idx, u[0, :R], v[0, :R])
