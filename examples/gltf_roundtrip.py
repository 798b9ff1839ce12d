"""Export a procedural model to GLB, then render it through the CLI import
path — the full user flow of the reference's drag-and-drop import
(reference: src/main.ts:246-302) without a browser.

    python examples/gltf_roundtrip.py [-o out.png]
"""

import argparse
import sys
import tempfile

from tpu_pathtracer.cli import main as cli_main
from tpu_pathtracer.io.gltf import save_glb
from tpu_pathtracer.scene import primitives
from tpu_pathtracer.scene.host import Material, Mesh


def run(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="gltf_roundtrip.png")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args(argv)

    p, n, i = primitives.torus_knot(0.5, 0.18, 128, 16)
    mat = Material(color=(0.3, 0.6, 0.9), roughness=0.3, metalness=0.7)
    with tempfile.NamedTemporaryFile(suffix=".glb", delete=False) as f:
        glb_path = f.name
    save_glb([Mesh(p, n, i, mat)], glb_path)
    print(f"exported {glb_path}", file=sys.stderr)

    return cli_main([
        "render", "--scene", glb_path,
        "--width", str(args.size), "--height", str(args.size),
        "--frames", str(args.frames), "--bounces", "4",
        "--camera-position", "0.8", "0.9", "1.8",
        "--look-at", "0", "0.45", "0",
        "-o", args.output,
    ])


if __name__ == "__main__":
    sys.exit(run())
