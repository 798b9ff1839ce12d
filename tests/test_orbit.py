"""Orbit camera controller tests (OrbitControls equivalent,
reference: src/main.ts:366-371)."""

import math

import numpy as np

from tpu_pathtracer.utils import OrbitCamera


def test_position_on_sphere():
    o = OrbitCamera(target=(1, 2, 3), radius=5.0, azimuth=0.3, elevation=0.4)
    d = np.linalg.norm(o.position - np.array([1, 2, 3]))
    assert abs(d - 5.0) < 1e-9


def test_camera_looks_at_target():
    o = OrbitCamera(target=(0, 0.5, 0), radius=4.0, azimuth=1.0, elevation=0.2)
    cam = o.camera()
    want = np.array([0, 0.5, 0]) - o.position
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(np.asarray(cam.direction), want, atol=1e-6)


def test_rotate_wraps_and_clamps():
    o = OrbitCamera()
    o2 = o.rotate(2 * math.pi + 0.1, 10.0)
    assert abs(o2.azimuth - (o.azimuth + 0.1)) < 1e-9
    assert o2.elevation < math.pi / 2  # clamped below the pole


def test_zoom_bounded():
    o = OrbitCamera(radius=1.0)
    assert o.zoom(1e-9).radius == o.min_radius
    assert abs(o.zoom(2.0).radius - 2.0) < 1e-12


def test_pan_moves_target_in_screen_plane():
    o = OrbitCamera(target=(0, 0, 0), azimuth=0.0, elevation=0.0, radius=4)
    # camera sits at +Z looking down -Z; screen-right is -X... verify pan
    # keeps the camera-target distance and moves orthogonally to view dir
    o2 = o.pan(0.5, 0.0)
    view = np.asarray(o.target) - o.position
    moved = np.asarray(o2.target) - np.asarray(o.target)
    assert abs(np.dot(moved, view)) < 1e-9
    assert abs(np.linalg.norm(moved) - 0.5) < 1e-9
    assert abs(o2.radius - o.radius) < 1e-12


def test_blue_noise_properties():
    """Blue-noise ranks: unique, uniform, and high-frequency (low energy at
    low spatial frequencies vs white noise)."""
    from tpu_pathtracer.utils.bluenoise import blue_noise

    n = 32
    bn = blue_noise(n, seed=1)
    assert bn.shape == (n, n)
    # every rank unique and uniformly covering [0, 1)
    assert len(np.unique(bn)) == n * n
    assert abs(bn.mean() - 0.5) < 1e-6

    def lowfreq_energy(x):
        f = np.abs(np.fft.fftshift(np.fft.fft2(x - x.mean()))) ** 2
        c = n // 2
        r = 4
        return f[c - r:c + r, c - r:c + r].sum() / f.sum()

    rng = np.random.default_rng(0)
    white = rng.permutation(n * n).reshape(n, n) / (n * n)
    # blue noise concentrates energy at high frequencies
    assert lowfreq_energy(bn) < 0.5 * lowfreq_energy(white)
