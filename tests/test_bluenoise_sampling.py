"""Blue-noise low-discrepancy AA sampling: the reference's dead asset made
live (src/assets/noise.ts; loader commented at src/renderer.ts:562-588).

A/B image test: with the blue-noise Cranley–Patterson jitter
(ops/trace.render_frame blue_noise=...), the LOW-FREQUENCY energy of the
render error must drop markedly versus the hash jitter at equal sample
count (that is the entire point of blue noise: push error into high
frequencies), without hurting overall MSE.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

import tpu_pathtracer as pt
from tpu_pathtracer.ops.trace import accumulate, render_frame
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.types import Camera, RenderParams
from tpu_pathtracer.utils.bluenoise import blue_noise_table

W = H = 32


def _budget_fn(scene, bn):
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def budget(scene, n, use_bn):
        def body(f, acc):
            p = RenderParams.create(cam, frame=1)
            p = dataclasses.replace(p, frame=(f + 1).astype(jnp.uint32))
            img = render_frame(scene, p, width=W, height=H, aspect=1.0,
                               samples_per_frame=1, max_bounces=2,
                               blue_noise=bn if use_bn else None)
            return accumulate(acc, img, p.frame)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((H, W, 3), jnp.float32))

    return budget


def _lowfreq_energy(err, k=8):
    c = np.cumsum(np.cumsum(np.pad(err, ((1, 0), (1, 0), (0, 0))), 0), 1)
    box = (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)
    return float((box ** 2).sum())


def test_blue_noise_reduces_low_frequency_error():
    scene = pt.default_scene(gradient_sky(32, 64)).compile()
    bn = blue_noise_table(64)
    budget = _budget_fn(scene, bn)

    truth = np.asarray(budget(scene, 400, False), np.float64)
    e_white = np.asarray(budget(scene, 8, False), np.float64) - truth
    e_blue = np.asarray(budget(scene, 8, True), np.float64) - truth

    # measured on this config: ~23.3 vs ~10.2 — require a solid margin
    assert _lowfreq_energy(e_blue) < 0.75 * _lowfreq_energy(e_white), (
        _lowfreq_energy(e_blue), _lowfreq_energy(e_white))
    # and the trade must not cost overall accuracy
    assert (e_blue ** 2).mean() < 1.15 * (e_white ** 2).mean()


def test_blue_noise_table_shape_and_ranks():
    bn = blue_noise_table(16)
    assert bn.shape == (16, 16, 2)
    for k in range(2):
        plane = np.sort(bn[..., k].ravel())
        # unique equidistributed ranks in [0, 1)
        assert np.allclose(plane, (np.arange(256) + 0.5) / 256, atol=1e-6) or (
            np.unique(plane).size == 256 and plane.min() >= 0 and plane.max() < 1
        )


def test_blue_noise_renderer_config():
    """RenderConfig.blue_noise threads through the Renderer step."""
    scene = pt.default_scene(gradient_sky(16, 32))
    cam = Camera.create(position=(0, 1, 4), look_at=(0, 0.5, 0), fov=45)
    r = pt.Renderer(scene, cam,
                    pt.RenderConfig(width=16, height=16, frames=2,
                                    blue_noise=True),
                    pt.PostConfig(denoise=False))
    r.reset()
    r.render_all()
    img = np.asarray(r.accumulation)
    assert np.isfinite(img).all() and img.max() > 0
