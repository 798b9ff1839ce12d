"""Independent numpy oracle of the reference path tracer.

A from-the-spec reimplementation of the WGSL kernels
(reference: src/passes/shaders/raytrace.wgsl, accumulate.wgsl,
fullscreen.wgsl) in plain numpy, deliberately sharing no code with the JAX
implementation in ops/:

  * intersection is brute-force over every triangle (no BVH) — a structurally
    different path that cross-checks the BVH builder + traversal,
  * the uint32 RNG stream is bit-exact (integer ops),
  * float math runs in float64 except the RNG's u32->f32 normalization
    (kept f32 so branch decisions like `metalness >= rand` agree exactly).

Used by the golden tests: images must agree with the JAX tracer up to
transcendental-precision drift (a tiny fraction of edge pixels may take a
different path; tests bound both mean error and outlier count).
"""

from __future__ import annotations

import numpy as np

SEED = np.uint32(123456789)
TWOPI = np.float64(np.float32(6.28318530718))
INVPI = np.float64(np.float32(0.31830988618))
INVTWOPI = np.float64(np.float32(0.15915494309))
EPSILON = 1e-6
INF = 1e20


def rand(seed):
    """seed: (R,) uint32 -> (seed, (R,) float32-valued f64)."""
    seed = (seed * np.uint32(747796405) + np.uint32(2891336453)).astype(np.uint32)
    word = ((seed >> ((seed >> np.uint32(28)) + np.uint32(4))) ^ seed) * np.uint32(277803737)
    word = (word >> np.uint32(22)) ^ word
    value = np.float32(word) / np.float32(4294967295.0)
    return seed, value.astype(np.float64)


def rand_normal(seed):
    seed, r1 = rand(seed)
    seed, r2 = rand(seed)
    with np.errstate(divide="ignore"):
        rho = np.sqrt(-2.0 * np.log(r2))
    return seed, rho * np.cos(TWOPI * r1)


def rand_direction(seed):
    seed, x = rand_normal(seed)
    seed, y = rand_normal(seed)
    seed, z = rand_normal(seed)
    v = np.stack([x, y, z], axis=-1)
    return seed, v / np.linalg.norm(v, axis=-1, keepdims=True)


def rand_cosine_hemisphere(seed, normal):
    seed, d = rand_direction(seed)
    v = normal + d
    return seed, v / np.linalg.norm(v, axis=-1, keepdims=True)


def rand_point_in_circle(seed):
    seed, r1 = rand(seed)
    seed, r2 = rand(seed)
    theta = TWOPI * r1
    rho = np.sqrt(r2)
    return seed, np.stack([rho * np.cos(theta), rho * np.sin(theta)], axis=-1)


def camera_ray(position, direction, fov, aspect, uv):
    """raytrace.wgsl:217-245.  uv: (R,2).  Returns (origin (R,3), dir (R,3))."""
    t = np.tan(np.deg2rad(fov) / 2.0)
    r = aspect * t
    u = -r + 2.0 * r * uv[:, 0]
    v = -t + 2.0 * t * uv[:, 1]

    w = -np.asarray(direction, np.float64)
    w = w / np.linalg.norm(w)
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(w, up)) > 0.99999:
        up = np.array([0.0, 0.0, 1.0])
    u_dir = np.cross(up, w)
    u_dir /= np.linalg.norm(u_dir)
    v_dir = np.cross(w, u_dir)

    d = u_dir[None, :] * u[:, None] + v_dir[None, :] * v[:, None] - w[None, :] * aspect
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.asarray(position, np.float64), d.shape).copy()
    return o, d


def intersect_brute(ro, rd, p0, p1, p2):
    """Nearest-hit Möller–Trumbore over all triangles.  ro, rd: (R,3);
    triangle arrays (N,3).  Returns (hit (R,), t, tri_idx, u, v)."""
    R = ro.shape[0]
    best_t = np.full(R, INF)
    best_tri = np.full(R, -1, np.int64)
    best_u = np.zeros(R)
    best_v = np.zeros(R)

    edge1 = p1 - p0
    edge2 = p2 - p0
    for i in range(p0.shape[0]):
        h = np.cross(rd, edge2[i])
        a = h @ edge1[i]
        ok = np.abs(a) >= EPSILON
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 1.0 / a
            s = ro - p0[i]
            u = f * np.einsum("rj,rj->r", s, h)
            q = np.cross(s, edge1[i][None, :].repeat(R, 0))
            v = f * np.einsum("rj,rj->r", rd, q)
            t = f * (q @ edge2[i])
        ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > EPSILON)
        take = ok & (t < best_t)
        best_t = np.where(take, t, best_t)
        best_tri = np.where(take, i, best_tri)
        best_u = np.where(take, u, best_u)
        best_v = np.where(take, v, best_v)
    return best_tri >= 0, best_t, best_tri, best_u, best_v


def env_uv_from_dir(d, rotation):
    cr, sr = np.cos(rotation), np.sin(rotation)
    x = d[:, 0] * cr - d[:, 2] * sr
    y = d[:, 1]
    z = d[:, 0] * sr + d[:, 2] * cr
    phi = np.arctan2(x, z)
    theta = np.arcsin(np.clip(y, -1.0, 1.0))
    return np.stack([phi * INVTWOPI + 0.5, -theta * INVPI + 0.5], axis=-1)


def sample_env_bilinear(img, uv):
    h, w = img.shape[:2]
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    top = img[y0c, x0c] * (1 - fx) + img[y0c, x1c] * fx
    bot = img[y1c, x0c] * (1 - fx) + img[y1c, x1c] * fx
    return top * (1 - fy) + bot * fy


class OracleScene:
    """Plain-array scene for the oracle tracer."""

    def __init__(self, p0, p1, p2, n0, n1, n2, mat_idx, materials, env_radiance):
        self.p0, self.p1, self.p2 = (np.asarray(a, np.float64) for a in (p0, p1, p2))
        self.n0, self.n1, self.n2 = (np.asarray(a, np.float64) for a in (n0, n1, n2))
        self.mat_idx = np.asarray(mat_idx, np.int64)
        self.materials = materials  # list of host Material
        self.env = np.asarray(env_radiance, np.float64)

    @classmethod
    def from_host_scene(cls, scene):
        p0, p1, p2, n0, n1, n2, mat, materials = scene.gather_triangles()
        env = scene.env_radiance if scene.env_radiance is not None else np.zeros((8, 16, 3))
        return cls(p0, p1, p2, n0, n1, n2, mat, materials, env)


def trace(scene: OracleScene, ro, rd, seed, max_bounces, env_intensity=1.0, env_rotation=0.0):
    """raytrace.wgsl:373-411 with vectorized lanes + masks."""
    R = ro.shape[0]
    incoming = np.zeros((R, 3))
    color = np.ones((R, 3))
    active = np.ones(R, bool)
    ro = ro.copy()
    rd = rd.copy()
    seed = seed.copy()

    mats = scene.materials
    m_color = np.array([m.color for m in mats], np.float64).reshape(-1, 3)
    m_spec = np.array([m.specular_color for m in mats], np.float64).reshape(-1, 3)
    m_rough = np.array([m.roughness for m in mats], np.float64)
    m_metal = np.array([np.float32(m.metalness) for m in mats], np.float64)
    m_ecol = np.array([m.emission_color for m in mats], np.float64).reshape(-1, 3)
    m_estr = np.array([m.emission_strength for m in mats], np.float64)

    for _ in range(max_bounces):
        hit, t, tri, u, v = intersect_brute(ro, rd, scene.p0, scene.p1, scene.p2)
        hit_mask = active & hit
        miss_mask = active & ~hit

        tri_c = np.clip(tri, 0, scene.p0.shape[0] - 1)
        w = 1.0 - u - v
        normal = (
            scene.n0[tri_c] * w[:, None]
            + scene.n1[tri_c] * u[:, None]
            + scene.n2[tri_c] * v[:, None]
        )
        normal /= np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True), 1e-300)
        position = ro + t[:, None] * rd

        mi = np.clip(scene.mat_idx[tri_c], 0, len(mats) - 1) if len(mats) else np.zeros_like(tri_c)

        seed_h, diffuse = rand_cosine_hemisphere(seed, normal)
        seed_h, r_spec = rand(seed_h)
        metal = m_metal[mi] if len(mats) else np.zeros(R)
        is_spec = (metal >= np.float32(r_spec).astype(np.float64)).astype(np.float64)
        spec_dir = rd - 2.0 * np.einsum("rj,rj->r", rd, normal)[:, None] * normal
        blend = (is_spec * (1.0 - (m_rough[mi] if len(mats) else np.ones(R))))[:, None]
        new_dir = diffuse + (spec_dir - diffuse) * blend

        env_uv = env_uv_from_dir(rd, env_rotation)
        env_col = sample_env_bilinear(scene.env, env_uv) * env_intensity

        if len(mats):
            emitted = m_ecol[mi] * m_estr[mi][:, None]
            incoming += np.where(hit_mask[:, None], emitted * color, 0.0)
        incoming += np.where(miss_mask[:, None], env_col * color, 0.0)
        if len(mats):
            through = m_color[mi] + (m_spec[mi] - m_color[mi]) * is_spec[:, None]
            color = np.where(hit_mask[:, None], color * through, color)

        ro = np.where(hit_mask[:, None], position, ro)
        rd = np.where(hit_mask[:, None], new_dir, rd)
        seed = np.where(hit_mask, seed_h, seed)
        active = hit_mask

    return incoming, seed


def render_frame(
    scene: OracleScene,
    *,
    width,
    height,
    aspect,
    frame,
    camera_position,
    camera_direction,
    fov=45.0,
    focal_distance=1.0,
    aperture=0.0,
    samples_per_frame=1,
    max_bounces=4,
    env_intensity=1.0,
    env_rotation=0.0,
):
    """raytrace.wgsl computeMain (423-478): per-pixel seeds, DoF/AA jitter,
    spp averaging.  Returns (H, W, 3)."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    uv = np.stack([xs / width, ys / height], axis=-1).reshape(-1, 2)
    index = (xs + ys * width).reshape(-1).astype(np.uint32)
    seed = (index + np.uint32(frame) * np.uint32(719393) + SEED).astype(np.uint32)

    base_o, base_d = camera_ray(camera_position, camera_direction, fov, aspect, uv)

    total = np.zeros((width * height, 3))
    for _ in range(samples_per_frame):
        seed, disk1 = rand_point_in_circle(seed)
        seed, disk2 = rand_point_in_circle(seed)
        jitter = np.concatenate(
            [disk1 / np.array([width, height], np.float64), np.zeros((len(seed), 1))], axis=-1
        )
        jitter2 = np.concatenate([disk2 * aperture, np.zeros((len(seed), 1))], axis=-1)
        focal = base_o + base_d * focal_distance + jitter
        o = base_o + jitter2
        d = focal - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        light, seed = trace(
            scene, o, d, seed, max_bounces, env_intensity=env_intensity, env_rotation=env_rotation
        )
        total += light

    return (total / samples_per_frame).reshape(height, width, 3)


def accumulate(prev, cur, frame, enabled=True):
    """accumulate.wgsl:21-28."""
    weight = 1.0 / frame if (enabled and frame > 0) else 1.0
    if not enabled:
        weight = 1.0
    return prev + (cur - prev) * weight


def aces(color):
    """fullscreen.wgsl:88-103 (column-major mat3 constructors)."""
    m1 = np.array(
        [[0.59719, 0.35458, 0.04823], [0.07600, 0.90834, 0.01566], [0.02840, 0.13383, 0.83777]]
    )
    m2 = np.array(
        [[1.60475, -0.53108, -0.07367], [-0.10208, 1.10813, -0.00605], [-0.00327, -0.07276, 1.07602]]
    )
    v = color @ m1.T
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return np.clip((a / b) @ m2.T, 0.0, 1.0) ** (1.0 / 2.2)
