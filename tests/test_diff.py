"""Differentiability tests (SURVEY.md §4 item 3): autodiff gradients vs
central finite differences on the deterministic fixed-seed render, plus an
inverse-rendering convergence check (BASELINE.json configs[4]).

Finite differences are exact-comparable because the render is a pure
function of (scene, params) with an integer RNG stream: both FD evaluations
replay identical sampling decisions as long as eps doesn't flip a discrete
branch — kept unlikely by the smooth default scene and tiny eps.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer import diff
from tpu_pathtracer.scene import primitives
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.host import Material, Mesh, Scene, rotation_x, translation
from tpu_pathtracer.scene.types import Camera, RenderParams

W = H = 12
ASPECT = 1.0
KW = dict(width=W, height=H, aspect=ASPECT, samples_per_frame=1, max_bounces=2)


@pytest.fixture(scope="module")
def scene_data():
    red = Material(color=(0.8, 0.2, 0.2), roughness=1.0, metalness=0.0)
    white = Material(color=(0.9, 0.9, 0.9), roughness=0.6, metalness=0.3)
    sc = Scene()
    p, n, i = primitives.plane(4, 4)
    sc.add(Mesh(p, n, i, white, transform=rotation_x(-math.pi / 2)))
    p, n, i = primitives.box(0.8, 0.8, 0.8)
    sc.add(Mesh(p, n, i, red, transform=translation(0, 0.4, 0)))
    sc.set_environment(gradient_sky(16, 32))
    return sc.compile()


def _params(frame=1):
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    return RenderParams.create(cam, frame=frame)


@pytest.fixture(scope="module")
def target(scene_data):
    return diff.render_frame_diff(scene_data, _params(), **KW)


def _fd_check(loss_p, values, path, idx, eps, atol, rtol):
    """Central finite difference on values[path].flat[idx] vs autodiff."""
    g = jax.grad(loss_p)(values)[path]
    flat = np.asarray(values[path], np.float64).copy()
    shape = flat.shape
    flat = flat.reshape(-1)

    def eval_at(delta):
        v2 = flat.copy()
        v2[idx] += delta
        vals = dict(values)
        vals[path] = jnp.asarray(v2.reshape(shape), jnp.float32)
        return float(loss_p(vals))

    fd = (eval_at(eps) - eval_at(-eps)) / (2 * eps)
    ad = float(np.asarray(g).reshape(-1)[idx])
    assert math.isfinite(ad)
    assert abs(ad - fd) <= atol + rtol * abs(fd), (path, idx, ad, fd)
    return ad, fd


def test_diff_forward_matches_nondiff(scene_data):
    """The differentiable intersect path must not change the forward image."""
    from tpu_pathtracer.ops.trace import render_frame

    a = render_frame(scene_data, _params(), **KW)
    b = diff.render_frame_diff(scene_data, _params(), **KW)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_grad_material_color_fd(scene_data, target):
    # Perturbed target so the loss isn't at its exact minimum (zero grads).
    tgt = target * 0.8
    loss = diff.make_loss(tgt, **{k: KW[k] for k in ("width", "height", "aspect",
                                                      "samples_per_frame", "max_bounces")})
    loss_p = diff.make_param_loss(loss, scene_data, _params(), ["materials.color"])
    values = diff.extract(scene_data, _params(), ["materials.color"])
    ad, fd = _fd_check(loss_p, values, "materials.color", 0, 1e-3, 1e-5, 5e-2)
    assert abs(ad) > 0  # box color definitely affects the image


def test_grad_emission_fd(scene_data, target):
    tgt = target * 1.3
    loss = diff.make_loss(tgt, **{k: KW[k] for k in ("width", "height", "aspect",
                                                      "samples_per_frame", "max_bounces")})
    paths = ["materials.emission_strength"]
    loss_p = diff.make_param_loss(loss, scene_data, _params(), paths)
    values = diff.extract(scene_data, _params(), paths)
    _fd_check(loss_p, values, paths[0], 0, 1e-3, 1e-6, 5e-2)


def test_grad_env_radiance_fd(scene_data, target):
    tgt = target * 0.9
    loss = diff.make_loss(tgt, **{k: KW[k] for k in ("width", "height", "aspect",
                                                      "samples_per_frame", "max_bounces")})
    paths = ["env.radiance"]
    loss_p = diff.make_param_loss(loss, scene_data, _params(), paths)
    values = diff.extract(scene_data, _params(), paths)
    g = np.asarray(jax.grad(loss_p)(values)["env.radiance"])
    assert np.isfinite(g).all()
    # pick the strongest-gradient texel for a well-conditioned FD check
    idx = int(np.abs(g).reshape(-1).argmax())
    assert np.abs(g).max() > 0
    _fd_check(loss_p, values, "env.radiance", idx, 1e-2, 1e-6, 5e-2)


def test_grad_camera_fd(scene_data, target):
    tgt = jnp.roll(target, 1, axis=0)  # shifted target -> camera wants to move
    loss = diff.make_loss(tgt, **{k: KW[k] for k in ("width", "height", "aspect",
                                                      "samples_per_frame", "max_bounces")})
    paths = ["camera.fov"]
    loss_p = diff.make_param_loss(loss, scene_data, _params(), paths)
    values = diff.extract(scene_data, _params(), paths)
    g = float(jax.grad(loss_p)(values)["camera.fov"])
    assert math.isfinite(g)
    # FD on fov: small eps, grads can be noisy through AA jitter -> loose rtol
    _fd_check(loss_p, values, "camera.fov", 0, 1e-3, 5e-4, 2e-1)


def test_grads_full_pytree_finite(scene_data, target):
    loss = diff.make_loss(target * 0.5, **{k: KW[k] for k in (
        "width", "height", "aspect", "samples_per_frame", "max_bounces")})
    gs, gp = diff.grads(loss, scene_data, _params())
    for leaf in jax.tree_util.tree_leaves(gs) + jax.tree_util.tree_leaves(gp):
        if np.issubdtype(np.asarray(leaf).dtype, np.floating):
            assert np.isfinite(np.asarray(leaf)).all()


def test_invert_recovers_material_color(scene_data, target):
    """Start from the wrong box color; adam on the image loss must recover it."""
    true_color = np.asarray(scene_data.materials.color)
    wrong = scene_data.materials.color.at[1].set(jnp.array([0.2, 0.7, 0.4]))
    import dataclasses

    bad_mats = dataclasses.replace(scene_data.materials, color=wrong)
    bad_scene = dataclasses.replace(scene_data, materials=bad_mats)

    res = diff.invert(
        bad_scene, _params(), target, ["materials.color"],
        width=W, height=H, aspect=ASPECT, samples_per_frame=1,
        max_bounces=2, steps=60, learning_rate=5e-2,
    )
    assert res.losses[-1] < res.losses[0] * 0.05, res.losses[::10]
    rec = np.asarray(res.values["materials.color"])
    # material 1 is the box; it must move decisively toward the true color
    assert np.abs(rec[1] - true_color[1]).max() < 0.1, (rec[1], true_color[1])
