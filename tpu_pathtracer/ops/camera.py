"""Camera ray generation: pinhole frustum + thin-lens depth of field.

Matches the reference's camera model exactly, including its quirks
(reference: src/passes/shaders/raytrace.wgsl:217-250, 444-449):

  * frustum half-extent t = tan(fov/2), half-width r = aspect*t, and the ray
    direction is `normalize(u*u_dir + v*v_dir - w*aspect)` — i.e. the focal
    length equals the *aspect ratio* (raytrace.wgsl:238),
  * orthonormal basis from the (normalized, negated) view direction with the
    up-vector degeneracy fix at |dot| > 0.99999 (raytrace.wgsl:226-235),
  * uv = pixel_coord / resolution with no half-pixel offset
    (raytrace.wgsl:247-250); AA comes from the DoF jitter instead,
  * DoF + AA: both jitters are applied in *world axes* (x, y, 0): the focal
    point moves by (disk / resolution) and the origin by (disk * aperture)
    (raytrace.wgsl:444-449).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import rng
from .vecmath import normalize


def camera_basis(direction):
    """Returns (u_dir, v_dir, w) per raytrace.wgsl:226-235.  `direction` (3,)."""
    w = normalize(-direction)
    up_default = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    up_alt = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    degenerate = jnp.abs(jnp.vecdot(w, up_default)) > np.float32(0.99999)
    up = jnp.where(degenerate, up_alt, up_default)
    u_dir = normalize(jnp.cross(up, w))
    v_dir = jnp.cross(w, u_dir)
    return u_dir, v_dir, w


def camera_rays(camera, uv, aspect):
    """Primary rays for pixel uvs.

    camera: scene.types.Camera;  uv: (R, 2) f32;  aspect: scalar (display W/H).
    Returns (origin (R,3), direction (R,3)).
    """
    fov_rad = camera.fov * np.float32(np.pi / 180.0)
    t = jnp.tan(fov_rad / np.float32(2.0))
    r = aspect * t
    u = -r + (r - (-r)) * uv[..., 0]
    v = -t + (t - (-t)) * uv[..., 1]

    u_dir, v_dir, w = camera_basis(camera.direction)
    direction = normalize(
        u_dir * u[..., None] + v_dir * v[..., None] - w * jnp.asarray(aspect, jnp.float32)
    )
    origin = jnp.broadcast_to(camera.position, direction.shape)
    return origin, direction


def apply_dof(seed, origin, direction, camera, resolution, aa_uniforms=None):
    """Per-sample AA + thin-lens jitter (raytrace.wgsl:444-449).

    resolution: (2,) f32 (scaled render resolution, like uniforms.resolution).
    `aa_uniforms`: optional (R, 2) uniforms driving the AA disk point in
    place of the two hash draws (the blue-noise low-discrepancy path,
    ops/trace.render_frame); when given, the seed stream skips those draws.
    Returns (seed, new_origin, new_direction).
    """
    if aa_uniforms is None:
        seed, disk1 = rng.rand_point_in_circle(seed)
    else:
        disk1 = rng.disk_from_uniforms(aa_uniforms[..., 0], aa_uniforms[..., 1])
    seed, disk2 = rng.rand_point_in_circle(seed)
    zeros = jnp.zeros(disk1.shape[:-1] + (1,), jnp.float32)
    jitter = jnp.concatenate([disk1 / resolution, zeros], axis=-1)
    jitter2 = jnp.concatenate([disk2 * camera.aperture, zeros], axis=-1)
    focal_point = origin + direction * camera.focal_distance + jitter
    new_origin = origin + jitter2
    new_direction = normalize(focal_point - new_origin)
    return seed, new_origin, new_direction
