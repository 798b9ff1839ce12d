"""RNG parity + distribution tests (reference: raytrace.wgsl:253-287)."""

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops import rng
from tpu_pathtracer.oracle import reference as oracle


def test_uint32_stream_exact():
    seed = np.arange(4096, dtype=np.uint32)
    js = jnp.asarray(seed)
    os = seed.copy()
    for _ in range(8):
        js, jv = rng.rand(js)
        os, ov = oracle.rand(os)
        assert np.array_equal(np.asarray(js), os), "integer RNG streams diverged"
        assert np.array_equal(np.asarray(jv, np.float64), ov), "uniform f32 values diverged"


def test_pixel_seed_formula():
    # seed = index + frame*719393 + 123456789 with u32 wraparound (raytrace.wgsl:435-436)
    s = rng.pixel_seed(jnp.asarray([0, 1, 2**31], dtype=jnp.uint32), 7)
    expected = (np.array([0, 1, 2**31], np.uint64) + 7 * 719393 + 123456789) % (2**32)
    assert np.array_equal(np.asarray(s, np.uint64), expected)


def test_uniform_moments():
    seed = jnp.arange(1 << 16, dtype=jnp.uint32)
    _, v = rng.rand(seed)
    v = np.asarray(v)
    assert 0.0 <= v.min() and v.max() <= 1.0
    assert abs(v.mean() - 0.5) < 5e-3
    assert abs(v.var() - 1.0 / 12.0) < 5e-3


def test_normal_moments():
    seed = jnp.arange(1 << 16, dtype=jnp.uint32)
    _, v = rng.rand_normal(seed)
    v = np.asarray(v)
    assert abs(v.mean()) < 2e-2
    assert abs(v.std() - 1.0) < 2e-2


def test_direction_is_unit_and_isotropic():
    seed = jnp.arange(1 << 14, dtype=jnp.uint32)
    _, d = rng.rand_direction(seed)
    d = np.asarray(d)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.all(np.abs(d.mean(axis=0)) < 2e-2)


def test_cosine_hemisphere_oriented():
    seed = jnp.arange(1 << 14, dtype=jnp.uint32)
    n = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (1 << 14, 1))
    _, d = rng.rand_cosine_hemisphere(seed, n)
    d = np.asarray(d)
    assert np.all(d[:, 1] > -1e-6), "cosine-weighted sample below the surface"
    # E[cos theta] = 2/3 for pdf = cos/pi
    assert abs(d[:, 1].mean() - 2.0 / 3.0) < 1e-2


def test_point_in_circle():
    seed = jnp.arange(1 << 14, dtype=jnp.uint32)
    _, p = rng.rand_point_in_circle(seed)
    p = np.asarray(p)
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform disk: E[r] = 2/3
    assert abs(r.mean() - 2.0 / 3.0) < 1e-2
