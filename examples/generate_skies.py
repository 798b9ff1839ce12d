"""Generate the framework's stock environment maps as .hdr files.

The reference ships three captured 1k HDRIs (public/static/env/*.hdr,
wired in src/main.ts:29-33).  This produces the procedural equivalents —
three Preetham sun-sky presets at the same 1024x512 resolution — ready
for `cli render --env <file>.hdr` or the viewer's .hdr upload.

    python examples/generate_skies.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_pathtracer.io.hdr import write_hdr
from tpu_pathtracer.scene.sky import sun_sky

PRESETS = {
    "noon_clear": dict(sun_elevation=60, sun_azimuth=90, turbidity=2.5),
    "golden_hour": dict(sun_elevation=6, sun_azimuth=90, turbidity=5.0),
    "hazy_afternoon": dict(sun_elevation=35, sun_azimuth=-120, turbidity=8.0),
}


def main(outdir: str = ".") -> None:
    os.makedirs(outdir, exist_ok=True)
    for name, kwargs in PRESETS.items():
        path = os.path.join(outdir, f"{name}_1k.hdr")
        write_hdr(path, sun_sky(512, 1024, **kwargs))
        print(path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
