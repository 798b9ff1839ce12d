"""CLI smoke tests (the reference's UI-shell surface, SURVEY.md §2 row 1)."""

import json
import os

import numpy as np
import pytest

from tpu_pathtracer.cli import main
from tpu_pathtracer.io.image import read_png


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "backend" in out


def test_cli_render_checkpoint_resume(tmp_path):
    png = str(tmp_path / "r.png")
    ckpt = str(tmp_path / "c.npz")
    args = ["render", "--width", "24", "--height", "24", "--frames", "2",
            "--bounces", "1", "--no-denoise", "--tonemap", "aces"]
    assert main(args + ["-o", png, "--checkpoint", ckpt]) == 0
    img2 = read_png(png)
    assert img2.shape[:2] == (24, 24)

    # resume to 4 frames must equal a fresh 4-frame render
    png_resumed = str(tmp_path / "r4a.png")
    args4 = ["render", "--width", "24", "--height", "24", "--frames", "4",
             "--bounces", "1", "--no-denoise", "--tonemap", "aces"]
    assert main(args4 + ["-o", png_resumed, "--resume", ckpt]) == 0
    png_fresh = str(tmp_path / "r4b.png")
    assert main(args4 + ["-o", png_fresh]) == 0
    np.testing.assert_array_equal(read_png(png_resumed), read_png(png_fresh))


def test_cli_render_scaled(tmp_path):
    png = str(tmp_path / "s.png")
    assert main(["render", "--width", "32", "--height", "32", "--scale", "0.5",
                 "--frames", "1", "--bounces", "1", "--no-denoise",
                 "-o", png]) == 0
    assert read_png(png).shape[:2] == (32, 32)  # upscaled to display res


def test_cli_benchmark(capsys):
    assert main(["benchmark", "--width", "16", "--height", "16",
                 "--frames", "2", "--bounces", "1", "--reps", "1"]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "rays/s" and rec["value"] > 0


def test_cli_invert(capsys):
    assert main(["invert", "--width", "10", "--height", "10", "--bounces", "2",
                 "--steps", "25", "--lr", "0.1"]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] < rec["loss_start"]


def test_cli_export_draco_roundtrip(tmp_path):
    from tpu_pathtracer.io import draco as _draco

    if not _draco.available():
        import pytest

        pytest.skip("native draco codec unavailable")
    raw = str(tmp_path / "scene.glb")
    drc = str(tmp_path / "scene_drc.glb")
    assert main(["export", "--scene", "default", "-o", raw]) == 0
    assert main(["export", "--scene", raw, "-o", drc, "--draco",
                 "--no-normalize"]) == 0
    import os

    assert os.path.getsize(drc) < os.path.getsize(raw)
    from tpu_pathtracer.io.gltf import load_gltf

    a = load_gltf(raw, normalize=False)
    b = load_gltf(drc, normalize=False)
    assert len(a) == len(b)
    import numpy as np

    for ma, mb in zip(a, b):
        assert np.array_equal(ma.indices, mb.indices)
        assert np.abs(ma.positions - mb.positions).max() < 2e-3
