"""Scene authoring + compile tests (reference: main.ts:49-75 default scene,
raytrace.ts:407-502 extraction, scene.ts types)."""

import math

import numpy as np

import tpu_pathtracer as pt
from tpu_pathtracer.scene import primitives
from tpu_pathtracer.scene.host import (
    Material,
    Mesh,
    Scene,
    rotation_x,
    scaling,
    translation,
)


def test_primitive_counts():
    p, n, i = primitives.plane(5, 5)
    assert p.shape == (4, 3) and i.shape == (2, 3)
    p, n, i = primitives.box(1, 1, 1)
    assert p.shape == (24, 3) and i.shape == (12, 3)
    p, n, i = primitives.sphere(0.5, 8, 6)
    # three.js: ws*(2*hs-2) triangles
    assert i.shape == (8 * (2 * 6 - 2), 3)
    assert np.allclose(np.linalg.norm(p, axis=1), 0.5, atol=1e-6)
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)


def test_plane_matches_threejs_layout():
    p, n, i = primitives.plane(2, 2)
    assert np.allclose(p[0], [-1, 1, 0])
    assert np.allclose(p[3], [1, -1, 0])
    assert (i == [[0, 2, 1], [2, 3, 1]]).all()
    assert np.allclose(n, [[0, 0, 1]] * 4)


def test_world_transform_and_normal_matrix():
    sc = Scene()
    p, n, i = primitives.plane(2, 2)
    # rotate the XY plane to horizontal: normal +z -> +y (raytrace.ts:455-476)
    sc.add(Mesh(p, n, i, Material(), transform=rotation_x(-math.pi / 2)))
    p0, p1, p2, n0, n1, n2, mat, mats = sc.gather_triangles()
    assert np.allclose(n0, [[0, 1, 0]] * 2, atol=1e-6)
    assert np.allclose(p0[:, 1], 0, atol=1e-6)

    # non-uniform scale: normal must use the inverse-transpose
    sc2 = Scene()
    sc2.add(Mesh(p, n, i, Material(), transform=scaling(2.0, 1.0, 1.0)))
    *_, n0b, _, _, _, _ = sc2.gather_triangles()
    assert np.allclose(n0b, [[0, 0, 1]] * 2, atol=1e-6)


def test_material_dedup():
    m = Material(color=(1, 0, 0))
    sc = Scene()
    p, n, i = primitives.plane(1, 1)
    sc.add(Mesh(p, n, i, m))
    sc.add(Mesh(p, n, i, m, transform=translation(2, 0, 0)))
    sc.add(Mesh(p, n, i, Material(color=(0, 1, 0))))
    *_, mat, mats = sc.gather_triangles()
    assert len(mats) == 2
    assert (mat == [0, 0, 0, 0, 1, 1]).all()


def test_invisible_meshes_skipped():
    sc = Scene()
    p, n, i = primitives.plane(1, 1)
    sc.add(Mesh(p, n, i, Material(), visible=False))
    p0, *_ = sc.gather_triangles()
    assert p0.shape[0] == 0


def test_compile_padding_and_dirty_flag():
    sc = pt.default_scene()
    assert sc.needs_update
    sd = sc.compile()
    assert not sc.needs_update
    n = sd.triangles.count
    assert (n & (n - 1)) == 0  # padded to a power of two
    # padded triangles are degenerate (all zeros)
    real = 2 + 12 + 32 * (2 * 32 - 2)
    assert np.allclose(np.asarray(sd.triangles.p0)[real:], 0.0)
    assert sd.materials.count == 2


def test_needs_update_triggers_recompile():
    scene = pt.Scene()
    scene.set_environment(np.ones((8, 16, 3), np.float32))
    cam = pt.Camera.create()
    r = pt.Renderer(scene, cam, pt.RenderConfig(width=4, height=4, frames=1, max_bounces=1),
                    pt.PostConfig(denoise=False))
    r.render_all()
    before = np.asarray(r.accumulation).mean()
    p, n, i = primitives.plane(50, 50)
    scene.add(Mesh(p, n, i, Material(color=(0, 0, 0)), transform=rotation_x(-math.pi / 2)))
    assert scene.needs_update
    r.reset()
    r.render_all()
    after = np.asarray(r.accumulation).mean()
    assert after != before  # new geometry was picked up
