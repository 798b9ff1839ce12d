"""Wavefront tracer must produce EXACTLY the megakernel's image: sorting
permutes lanes but preserves every per-ray RNG stream and the shade math is
shared (ops/wavefront.py vs ops/trace.py)."""

import math

import numpy as np
import pytest

from tpu_pathtracer.ops.trace import render_frame
from tpu_pathtracer.ops.wavefront import render_frame_wavefront
from tpu_pathtracer.scene import primitives
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.host import Material, Mesh, Scene, rotation_x, translation
from tpu_pathtracer.scene.types import Camera, RenderParams

W = H = 16


@pytest.fixture(scope="module")
def scene_data():
    sc = Scene()
    p, n, i = primitives.plane(4, 4)
    sc.add(Mesh(p, n, i, Material(roughness=0.4, metalness=0.5),
                transform=rotation_x(-math.pi / 2)))
    p, n, i = primitives.sphere(0.5, 12, 8)
    sc.add(Mesh(p, n, i, Material(color=(0.9, 0.4, 0.2)),
                transform=translation(0, 0.5, 0)))
    sc.set_environment(gradient_sky(16, 32))
    return sc.compile()


def _params(frame=1):
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45,
                        aperture=0.1, focal_distance=4.0)
    return RenderParams.create(cam, frame=frame)


@pytest.mark.parametrize("sort_rays", [False, True])
@pytest.mark.parametrize("chunk", [64, 256])
def test_wavefront_matches_megakernel(scene_data, sort_rays, chunk):
    kw = dict(width=W, height=H, aspect=1.0, samples_per_frame=2, max_bounces=3)
    mega = np.asarray(render_frame(scene_data, _params(), **kw))
    wave = np.asarray(render_frame_wavefront(
        scene_data, _params(), chunk=chunk, sort_rays=sort_rays, **kw))
    np.testing.assert_allclose(wave, mega, atol=1e-6, rtol=1e-6)


def test_wavefront_pads_to_chunk_multiple(scene_data):
    """Ray counts that don't divide the chunk are padded with inactive rays
    and still match the megakernel exactly."""
    kw = dict(width=10, height=10, aspect=1.0, samples_per_frame=1, max_bounces=2)
    mega = np.asarray(render_frame(scene_data, _params(), **kw))
    wave = np.asarray(render_frame_wavefront(
        scene_data, _params(), chunk=64, sort_rays=True, **kw))
    np.testing.assert_allclose(wave, mega, atol=1e-6, rtol=1e-6)


def test_wavefront_deep_bounces(scene_data):
    img = np.asarray(render_frame_wavefront(
        scene_data, _params(), width=W, height=H, aspect=1.0,
        samples_per_frame=1, max_bounces=8, chunk=64))
    assert np.isfinite(img).all() and img.max() > 0
