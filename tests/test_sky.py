"""Preetham sun-sky generator tests.

The generator stands in for the reference's three shipped equirect HDRIs
(reference: src/main.ts:29-33, public/static/env/*.hdr): same resolution
class, same orientation contract as the tracer's equirect sampler
(ops/envsample.env_uv_from_ray: row 0 = zenith, u = atan2(x,z)/2pi + 0.5).
"""

import numpy as np
import pytest

from tpu_pathtracer.scene.envmap import build_environment
from tpu_pathtracer.scene.sky import parse_sky_spec, sun_sky


class TestSunSky:
    def test_shape_dtype_finite(self):
        img = sun_sky(64, 128)
        assert img.shape == (64, 128, 3)
        assert img.dtype == np.float32
        assert np.isfinite(img).all()
        assert (img >= 0).all()

    def test_sun_at_expected_texel(self):
        # elevation 45, azimuth 90 -> v = (90-45)/180 = 0.25, u = 0.75
        img = sun_sky(128, 256, sun_elevation=45.0, sun_azimuth=90.0)
        lum = img.sum(-1)
        y, x = np.unravel_index(np.argmax(lum), lum.shape)
        assert abs(y / 128 - 0.25) < 0.03
        assert abs(x / 256 - 0.75) < 0.03

    def test_sun_disc_dominates(self):
        img = sun_sky(128, 256, sun_intensity=400.0)
        assert img.max() > 10.0  # HDR sun (energy-conserving widened disc)
        assert np.median(img.sum(-1)) < 5.0  # dome stays low dynamic

    def test_sun_energy_resolution_independent(self):
        # widened-disc energy conservation: total sun power ~ constant
        def sun_power(h, w):
            img = sun_sky(h, w, turbidity=2.0, sun_intensity=400.0)
            v = (np.arange(h) + 0.5) / h
            weight = np.sin(v * np.pi)[:, None]  # equirect solid angle
            lum = img.sum(-1)
            sky = np.median(lum)
            return ((lum - sky).clip(0) * weight).sum() * (np.pi / h) * (2 * np.pi / w)

        p1, p2 = sun_power(64, 128), sun_power(256, 512)
        assert 0.3 < p1 / p2 < 3.0

    def test_zenith_blue_when_clear(self):
        img = sun_sky(64, 128, sun_elevation=60.0, turbidity=2.0)
        r, g, b = img[0, 64]
        assert b > g > r  # clear-sky zenith is blue

    def test_turbidity_desaturates(self):
        clear = sun_sky(64, 128, turbidity=2.0)
        hazy = sun_sky(64, 128, turbidity=9.0)
        ratio = lambda im: im[0, 64, 2] / max(im[0, 64, 0], 1e-6)
        assert ratio(clear) > ratio(hazy)  # haze flattens the blue/red ratio

    def test_ground_below_horizon(self):
        img = sun_sky(64, 128)
        assert img[-1].max() < img[: 32].max()  # nadir darker than sky

    def test_intensity_scales(self):
        a = sun_sky(32, 64, intensity=1.0)
        b = sun_sky(32, 64, intensity=2.0)
        np.testing.assert_allclose(b, 2.0 * a, rtol=1e-5)

    def test_cdf_integration(self):
        env = build_environment(sun_sky(64, 128))
        assert np.isfinite(np.asarray(env.marginal_cdf)).all()

    def test_elevation_clamped(self):
        img = sun_sky(32, 64, sun_elevation=0.0)  # clamps to 0.5 deg
        assert np.isfinite(img).all()


class TestParseSkySpec:
    def test_plain(self):
        assert parse_sky_spec("sky") == {}

    def test_kwargs_and_aliases(self):
        out = parse_sky_spec("sky:elev=12,azimuth=45,turbidity=4,intensity=2")
        assert out == {"sun_elevation": 12.0, "sun_azimuth": 45.0,
                       "turbidity": 4.0, "intensity": 2.0}

    def test_bad_key_raises(self):
        with pytest.raises(TypeError):
            sun_sky(8, 16, **parse_sky_spec("sky:bogus=1"))
