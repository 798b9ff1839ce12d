"""Showcase render: torus knot + mirror sphere + emissive panel on a plane,
HDR-style gradient sky, depth of field, denoise + ACES.

    python examples/render_showcase.py [--size 512] [--frames 128] [-o out.png]
"""

import argparse
import math
import sys

import tpu_pathtracer as pt
from tpu_pathtracer.scene import primitives
from tpu_pathtracer.scene.envmap import gradient_sky
from tpu_pathtracer.scene.host import Material, Mesh, rotation_x, rotation_y, translation


def build_scene():
    sc = pt.Scene()
    floor = Material(color=(0.85, 0.85, 0.85), roughness=0.35, metalness=0.4)
    gold = Material(color=(0.95, 0.7, 0.2), specular_color=(1.0, 0.85, 0.5),
                    roughness=0.25, metalness=0.9)
    mirror = Material(color=(0.95, 0.95, 0.95), roughness=0.02, metalness=1.0)
    lamp = Material(color=(1, 1, 1), emission_color=(1.0, 0.85, 0.6),
                    emission_strength=14.0)

    sc.add(Mesh(*primitives.plane(8, 8), floor,
                transform=rotation_x(-math.pi / 2)))
    sc.add(Mesh(*primitives.torus_knot(0.45, 0.16, 160, 20), gold,
                transform=translation(-0.1, 0.62, 0) @ rotation_y(0.7)
                @ rotation_x(math.pi / 2)))
    sc.add(Mesh(*primitives.sphere(0.35, 48, 24), mirror,
                transform=translation(1.0, 0.35, -0.7)))
    sc.add(Mesh(*primitives.plane(1.4, 0.9), lamp,
                transform=translation(-1.4, 1.3, -0.9) @ rotation_y(0.9)))
    sc.set_environment(gradient_sky(256, 512))
    return sc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("-o", "--output", default="showcase.png")
    args = ap.parse_args(argv)

    cam = pt.Camera.create(position=(0.9, 1.35, 3.2), look_at=(0.1, 0.5, -0.1),
                           fov=38, focal_distance=3.2, aperture=0.03)
    cfg = pt.RenderConfig(width=args.size, height=args.size,
                          frames=args.frames, samples_per_frame=1,
                          max_bounces=5)
    r = pt.Renderer(build_scene(), cam, cfg, pt.PostConfig(denoise=True))
    r.on("progress", lambda pr: print(f"\r{int(pr*100):3d}%", end="",
                                      file=sys.stderr, flush=True))
    r.reset()
    r.render_all()
    r.screenshot(args.output)
    print(f"\n-> {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
