"""Pallas denoise kernel parity vs the jnp reference implementation
(interpreter mode on CPU; the real-TPU path is exercised by bench/verify)."""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.post.denoise import smart_denoise
from tpu_pathtracer.ops.pallas.denoise import smart_denoise_pallas, supported


@pytest.mark.parametrize("hw", [(16, 128), (32, 256)])
def test_pallas_denoise_matches_jnp(hw):
    h, w = hw
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    ref = np.asarray(smart_denoise(img))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(smart_denoise_pallas(img))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_pallas_denoise_constant_image():
    img = jnp.full((16, 128, 3), 0.25, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(smart_denoise_pallas(img))
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_supported_predicate():
    assert supported(512, 512)
    assert supported(1080, 1920)
    assert not supported(512, 500)      # width not lane-aligned
    assert not supported(100, 512)      # height not sublane-aligned
    assert not supported(8, 128, sigma=10.0)  # halo (16) exceeds height
