"""Round-3 kernel + fused-trace-path tests.

Covers ops/pallas/mt_shade.py (two-level-culled whole-scene kernel and the
HBM-streamed variant) and the sorted fused trace loop in ops/trace.py —
all in Pallas interpreter mode on CPU, against the XLA 'mt' formulation
(ops/mt_matmul.py) whose decisions they must reproduce.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_pathtracer.ops.mt_matmul import mt_intersect
from tpu_pathtracer.ops.pallas.mt_shade import (
    mt_intersect_pallas2,
    mt_intersect_stream2,
)


def random_soup(rng, n, spread=0.2):
    v0 = rng.uniform(-1, 1, (n, 3))
    e = rng.uniform(-spread, spread, (n, 2, 3))
    return jnp.asarray(
        np.concatenate([v0, v0 + e[:, 0], v0 + e[:, 1]], axis=1), jnp.float32
    )


def random_rays(rng, r):
    ro = jnp.asarray(rng.uniform(-1, 1, (r, 3)), jnp.float32)
    rd = rng.normal(size=(r, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True), jnp.float32)
    return ro, rd


def assert_hit_parity(ha, hb, min_hits=50):
    np.testing.assert_array_equal(np.asarray(ha.hit), np.asarray(hb.hit))
    m = np.asarray(ha.hit)
    assert m.sum() >= min_hits
    np.testing.assert_array_equal(np.asarray(ha.tri)[m], np.asarray(hb.tri)[m])
    np.testing.assert_allclose(np.asarray(ha.t)[m], np.asarray(hb.t)[m],
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ha.u)[m], np.asarray(hb.u)[m],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ha.v)[m], np.asarray(hb.v)[m],
                               rtol=1e-3, atol=1e-4)


def test_pallas2_parity():
    """Two-level-culled kernel matches the XLA MT decisions (random soup,
    unaligned counts exercise chunk/sub padding)."""
    rng = np.random.default_rng(5)
    tri = random_soup(rng, 700)
    ro, rd = random_rays(rng, 1300)
    ha = mt_intersect(tri, ro, rd)
    hb = mt_intersect_pallas2(tri, ro, rd, interpret=True)
    assert_hit_parity(ha, hb)


def test_pallas2_parked_rays_miss():
    """Parked rays (ro=1e30, rd=0 — the trace loop's wavefront-compaction
    encoding) report misses and never poison live lanes."""
    rng = np.random.default_rng(6)
    tri = random_soup(rng, 300)
    ro, rd = random_rays(rng, 600)
    park = jnp.asarray(np.arange(600) % 3 == 0)[:, None]
    ro_p = jnp.where(park, 1e30, ro)
    rd_p = jnp.where(park, 0.0, rd)
    ha = mt_intersect(tri, ro_p, rd_p)
    hb = mt_intersect_pallas2(tri, ro_p, rd_p, interpret=True)
    assert not np.asarray(hb.hit)[np.asarray(park)[:, 0]].any()
    assert_hit_parity(ha, hb)


def test_pallas2_empty_scene():
    rng = np.random.default_rng(7)
    ro, rd = random_rays(rng, 64)
    h = mt_intersect_pallas2(jnp.zeros((0, 9), jnp.float32), ro, rd,
                             interpret=True)
    assert not np.asarray(h.hit).any()


def test_stream2_parity_multi_super():
    """Streamed kernel (conditional DMA, super-treelet culling) matches the
    XLA MT decisions across a multi-super-treelet scene (>2048 triangles
    exercises the super loop and the dead-padding boxes)."""
    rng = np.random.default_rng(17)
    tri = random_soup(rng, 2200, spread=0.1)
    ro, rd = random_rays(rng, 640)
    ha = mt_intersect(tri, ro, rd)
    hb = mt_intersect_stream2(tri, ro, rd, interpret=True)
    assert_hit_parity(ha, hb)


def test_stream2_parked_tile_and_pad():
    rng = np.random.default_rng(18)
    tri = random_soup(rng, 2100, spread=0.1)
    ro = jnp.full((256, 3), 1e30, jnp.float32)
    rd = jnp.zeros((256, 3), jnp.float32)
    h = mt_intersect_stream2(tri, ro, rd, interpret=True)
    assert not np.asarray(h.hit).any()


def test_blocked_grid_roundtrip():
    from tpu_pathtracer.ops.trace import blocked_pixel_grid, unblock_image

    h, w = 48, 96
    xs, ys = blocked_pixel_grid(h, w)
    xs, ys = np.asarray(xs), np.asarray(ys)
    # every pixel appears exactly once
    assert sorted(xs + ys * w) == list(range(h * w))
    flat = jnp.asarray((xs + ys * w).astype(np.float32))[:, None]
    img = np.asarray(unblock_image(flat, h, w))[:, :, 0]
    expect = np.arange(h * w, dtype=np.float32).reshape(h, w)
    np.testing.assert_array_equal(img, expect)


def test_fused_trace_matches_plain_loop():
    """The sorted fused path (component-major state, per-bounce lax.sort
    binning, deferred env, blocked layout, final order-restoring sort)
    matches the plain trace loop running the same Pallas kernel to within
    FMA-fusion ULPs.

    Exact bit-equality across the two layouts is unattainable by
    construction: XLA contracts multiply-into-reduce chains (the dot in
    `reflect`, the norm in `normalize`) with FMAs differently for minor-
    vs major-axis reductions (measured: 1-ULP flips on 23-44% of lanes for
    an isolated dot).  The integer RNG streams ARE bit-exact
    (test_fused_trace_seed_stream_exact below); colors carry the ULP
    noise, so any tolerance violation here is a real semantic bug, not
    rounding."""
    import tpu_pathtracer as pt
    import tpu_pathtracer.ops.trace as tr
    from tpu_pathtracer.ops.trace import render_frame
    from tpu_pathtracer.scene.envmap import gradient_sky
    from tpu_pathtracer.scene.types import Camera, RenderParams

    scene = pt.default_scene(gradient_sky(8, 16))
    data = scene.compile()
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45,
                        aperture=0.05, focal_distance=4.0)
    params = RenderParams.create(cam, frame=2)
    kw = dict(width=32, height=32, aspect=1.0, samples_per_frame=1,
              max_bounces=3)
    img_fused = np.asarray(
        render_frame(data, params, intersector="mt_pallas", **kw)
    )
    orig = tr._any_vma
    tr._any_vma = lambda *a: True  # force the plain loop (same kernel)
    try:
        img_plain = np.asarray(
            render_frame(data, params, intersector="mt_pallas", **kw)
        )
    finally:
        tr._any_vma = orig
    np.testing.assert_allclose(img_fused, img_plain, rtol=1e-5, atol=1e-6)


def test_fused_trace_seed_stream_exact():
    """The fused path's integer RNG streams are BIT-exact vs the plain
    loop, and returned in input ray order (a seed slip would silently
    decorrelate progressive samples — unlike the float ULP noise, any
    integer mismatch is a real bug)."""
    import jax.numpy as jnp
    import tpu_pathtracer as pt
    import tpu_pathtracer.ops.trace as tr
    from tpu_pathtracer.ops.pallas.mt_shade import mt_intersect_pallas2_phi
    from tpu_pathtracer.scene.envmap import gradient_sky
    from tpu_pathtracer.scene.types import Camera, RenderParams

    scene = pt.default_scene(gradient_sky(8, 16)).compile()
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    params = RenderParams.create(cam, frame=2)
    rng = np.random.default_rng(3)
    R = 512
    ro = jnp.asarray(rng.uniform(-2, 2, (R, 3)), jnp.float32)
    rd = rng.normal(size=(R, 3))
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True),
                     jnp.float32)
    seed = jnp.asarray(rng.integers(0, 2**31, R), jnp.uint32)
    fn = lambda phi: mt_intersect_pallas2_phi(
        scene.packed.tri_pos, phi, interpret=True
    )
    inc_f, seed_f = tr.trace_rays_fused(
        scene, params, ro, rd, seed, max_bounces=3, intersector_phi_fn=fn
    )
    inc_p, seed_p = tr.trace_rays(
        scene, params, ro, rd, seed, max_bounces=3, intersector="mt_pallas"
    )
    np.testing.assert_array_equal(np.asarray(seed_f), np.asarray(seed_p))
    np.testing.assert_allclose(np.asarray(inc_f), np.asarray(inc_p),
                               rtol=1e-5, atol=1e-6)


def test_fused_trace_spp_seed_carry():
    """Multi-sample frames: the fused path must return seeds in input ray
    order so sample s+1 continues each pixel's RNG stream — checked by
    comparing a 2-spp frame against the plain loop (ULP tolerance, see
    test_fused_trace_matches_plain_loop)."""
    import tpu_pathtracer as pt
    import tpu_pathtracer.ops.trace as tr
    from tpu_pathtracer.ops.trace import render_frame
    from tpu_pathtracer.scene.envmap import gradient_sky
    from tpu_pathtracer.scene.types import Camera, RenderParams

    scene = pt.default_scene(gradient_sky(8, 16))
    data = scene.compile()
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    params = RenderParams.create(cam, frame=1)
    kw = dict(width=32, height=32, aspect=1.0, samples_per_frame=2,
              max_bounces=2)
    img_fused = np.asarray(
        render_frame(data, params, intersector="mt_pallas", **kw)
    )
    orig = tr._any_vma
    tr._any_vma = lambda *a: True
    try:
        img_plain = np.asarray(
            render_frame(data, params, intersector="mt_pallas", **kw)
        )
    finally:
        tr._any_vma = orig
    np.testing.assert_allclose(img_fused, img_plain, rtol=1e-5, atol=1e-6)


def test_fused_env_importance_matches_plain_loop():
    """Fused path with env_importance=True (round-4: the importance-sampled
    env term runs as ONE deferred post-loop pass — a miss is a ray's final
    event and the carried seed is the miss-time seed, so the 2 uniform
    draws + CDF inversion replay the plain loop's exactly).  Same ULP
    contract as test_fused_trace_matches_plain_loop."""
    import tpu_pathtracer as pt
    import tpu_pathtracer.ops.trace as tr
    from tpu_pathtracer.ops.trace import render_frame
    from tpu_pathtracer.scene.envmap import gradient_sky
    from tpu_pathtracer.scene.types import Camera, RenderParams

    scene = pt.default_scene(gradient_sky(8, 16))
    data = scene.compile()
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    params = RenderParams.create(cam, frame=3)
    kw = dict(width=32, height=32, aspect=1.0, samples_per_frame=1,
              max_bounces=3, env_importance=True)
    img_fused = np.asarray(
        render_frame(data, params, intersector="mt_pallas", **kw)
    )
    orig = tr._any_vma
    tr._any_vma = lambda *a: True  # force the plain loop (same kernel)
    try:
        img_plain = np.asarray(
            render_frame(data, params, intersector="mt_pallas", **kw)
        )
    finally:
        tr._any_vma = orig
    assert np.isfinite(img_fused).all()
    np.testing.assert_allclose(img_fused, img_plain, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cull", ["nf", "list", "cond"])
def test_pallas2_cull_modes_parity(cull):
    """All three culling strategies (near-far precull list / unordered
    precull list / in-kernel cond guards) reproduce the XLA MT decisions
    exactly, including with parked rays interleaved (round 4)."""
    rng = np.random.default_rng(11)
    tri = random_soup(rng, 500)
    ro, rd = random_rays(rng, 900)
    park = np.arange(900) % 4 == 0
    ro = jnp.asarray(np.where(park[:, None], 1e30, ro), jnp.float32)
    rd = jnp.asarray(np.where(park[:, None], 0.0, rd), jnp.float32)
    ha = mt_intersect(tri, ro, rd)
    hb = mt_intersect_pallas2(tri, ro, rd, interpret=True, cull=cull)
    assert not np.asarray(hb.hit)[park].any()
    assert_hit_parity(ha, hb, min_hits=30)


def test_direction_bin_partitions_unit_sphere():
    """Every direction maps to exactly one of the 96 bins; bins respect
    the dominant axis half-space (round-4 coherence key component)."""
    from tpu_pathtracer.ops.trace import _DIR_BINS, _direction_bin

    rng = np.random.default_rng(3)
    d = rng.normal(size=(5000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    bins = np.asarray(_direction_bin(jnp.asarray(d.T)))
    assert bins.shape == (5000,)
    assert bins.min() >= 0 and bins.max() < _DIR_BINS
    # dominant half-space consistency: half = bin // 16 encodes
    # (axis, sign) of the largest-|component| axis
    dom = np.abs(d).argmax(1)
    sgn = (np.take_along_axis(d, dom[:, None], 1)[:, 0] > 0).astype(int)
    # exclude near-ties between axes where either choice is valid
    sorted_abs = np.sort(np.abs(d), axis=1)
    clear = sorted_abs[:, 2] > sorted_abs[:, 1] * 1.01
    np.testing.assert_array_equal((bins // 16)[clear],
                                  (dom * 2 + sgn)[clear])


def test_coherence_key_groups_by_live_set():
    """Inactive rays get the sentinel key; rays that cannot touch any
    treelet (escapers) share a bin distinct from working rays."""
    from tpu_pathtracer.ops.trace import _coherence_key

    boxes = jnp.asarray(
        np.array([[0, 0, 0, 1, 1, 1, 0, 0]], np.float32))  # unit box
    # ray 0: points at the box; ray 1: points away; ray 2: inactive
    ro = jnp.asarray(np.array([[-1, .5, .5], [-1, .5, .5], [-1, .5, .5]],
                              np.float32).T)
    rd = jnp.asarray(np.array([[1, 0, 0], [-1, 0, 0], [1, 0, 0]],
                              np.float32).T)
    active = jnp.asarray([True, True, False])
    key = np.asarray(_coherence_key(ro, rd, active, boxes))
    assert key[2] == 2**31 - 1
    assert key[0] != key[1]
    # escaper (nearest = Mc sentinel) sorts after the working ray
    assert key[1] > key[0]


def test_windowed_sort_matches_global_render():
    """sort_window must not change the image at all: per-ray math is
    order-free and the unique-pixel restore puts every ray back
    (ops/trace._sort_window) — bit-identical across window sizes."""
    import jax
    import numpy as np

    import tpu_pathtracer as pt
    from tpu_pathtracer.ops.trace import render_frame
    from tpu_pathtracer.scene.envmap import gradient_sky
    from tpu_pathtracer.scene.types import Camera, RenderParams

    scene = pt.default_scene(gradient_sky(16, 32)).compile()
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    params = RenderParams.create(cam, frame=1)
    kw = dict(width=64, height=64, aspect=1.0, samples_per_frame=1,
              max_bounces=3)
    base = np.asarray(render_frame(scene, params, sort_window=0, **kw))
    for w in (256, 512):
        img = np.asarray(render_frame(scene, params, sort_window=w, **kw))
        np.testing.assert_array_equal(img, base)


def test_windowed_sort_helper_semantics():
    """_windowed_sort sorts each consecutive window independently and
    falls back to a global sort when fewer than 8 windows exist."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_pathtracer.ops.trace import _windowed_sort

    rng = np.random.default_rng(0)
    r, w = 8 * 16, 16
    key = jnp.asarray(rng.integers(0, 50, r), jnp.int32)
    pay = jnp.asarray(rng.random(r), jnp.float32)
    ks, ps = _windowed_sort((key, pay), w)
    kn, pn = np.asarray(ks), np.asarray(ps)
    for b in range(r // w):
        sl = slice(b * w, (b + 1) * w)
        assert (np.diff(kn[sl]) >= 0).all()
        # same multiset of (key, payload) pairs within the window
        got = sorted(zip(kn[sl].tolist(), pn[sl].tolist()))
        want = sorted(zip(np.asarray(key)[sl].tolist(),
                          np.asarray(pay)[sl].tolist()))
        assert got == want
    # < 8 windows -> one global sort
    ks2, _ = _windowed_sort((key, pay), r // 4)
    assert (np.diff(np.asarray(ks2)) >= 0).all()
