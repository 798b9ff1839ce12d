"""Post pipeline tests (reference: fullscreen.wgsl:53-126)."""

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.config import PostConfig, Tonemap
from tpu_pathtracer.oracle import reference as oracle
from tpu_pathtracer.post import (
    aces_tonemap,
    bilinear_resize,
    postprocess,
    reinhard_tonemap,
    smart_denoise,
)


def test_aces_matches_oracle():
    rs = np.random.RandomState(0)
    c = rs.rand(64, 3).astype(np.float32) * 4.0
    a = np.asarray(aces_tonemap(jnp.asarray(c)), np.float64)
    b = oracle.aces(c.astype(np.float64))
    assert np.allclose(a, b, atol=1e-5)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_reinhard():
    c = jnp.asarray(np.array([[0.0, 1.0, 3.0]], np.float32))
    out = np.asarray(reinhard_tonemap(c))
    assert np.allclose(out, [[0.0, 0.5, 0.75]], atol=1e-6)


def test_denoise_preserves_constant_image():
    img = jnp.full((16, 16, 3), 0.25, jnp.float32)
    out = np.asarray(smart_denoise(img))
    assert np.allclose(out, 0.25, atol=1e-5)


def test_denoise_reduces_noise_keeps_edges():
    rs = np.random.RandomState(0)
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0  # hard edge
    noisy = img + rs.normal(0, 0.03, img.shape).astype(np.float32)
    out = np.asarray(smart_denoise(jnp.asarray(noisy)))
    # noise reduced in flat regions (away from the wrap-around borders)
    assert out[4:12, 4:12].std() < noisy[4:12, 4:12].std() * 0.6
    # edge preserved: the two sides keep distinct levels
    assert abs(out[16, 8:12].mean() - out[16, 20:24].mean()) > 0.8


def test_bilinear_resize():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    same = np.asarray(bilinear_resize(img, 4, 4))
    assert np.allclose(same, np.asarray(img))
    up = np.asarray(bilinear_resize(img, 8, 8))
    assert up.shape == (8, 8, 1)
    assert np.isclose(up.mean(), np.asarray(img).mean(), atol=0.3)
    const = np.asarray(bilinear_resize(jnp.full((3, 5, 3), 0.7), 9, 10))
    assert np.allclose(const, 0.7, atol=1e-6)


def test_postprocess_pipeline_shapes():
    img = jnp.full((8, 8, 3), 0.5, jnp.float32)
    out = postprocess(img, PostConfig(denoise=True, tonemap=Tonemap.ACES), 16, 16)
    assert out.shape == (16, 16, 3)
    out2 = postprocess(img, PostConfig(denoise=False, tonemap=Tonemap.NONE))
    assert np.allclose(np.asarray(out2), 0.5)
