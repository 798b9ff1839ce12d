"""IO tests: PNG round-trip, Radiance HDR round-trip + RLE decode, and
glTF/GLB import (synthesized in-test containers; SURVEY.md §2 rows 10-11)."""

import json
import struct

import numpy as np
import pytest

from tpu_pathtracer.io.gltf import GLTFError, load_gltf
from tpu_pathtracer.io.hdr import _decode_rgbe, _encode_rgbe, read_hdr, write_hdr
from tpu_pathtracer.io.image import read_png, write_png
from tpu_pathtracer.scene.host import Material
from tpu_pathtracer.scene.host import Mesh as Mesh2


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (13, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    out = read_png(p)
    np.testing.assert_array_equal(out[..., :3], img)


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((8, 12, 3)).astype(np.float32) * 10.0) ** 2
    p = str(tmp_path / "x.hdr")
    write_hdr(p, img)
    out = read_hdr(p)
    assert out.shape == img.shape
    # RGBE shares one 8-bit exponent across channels: error bound is
    # (per-pixel max) / 128, not a relative tolerance per channel.
    bound = img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
    assert (np.abs(out - img) <= bound).all()


def test_hdr_rgbe_codec_black():
    z = np.zeros((4, 4, 3), np.float32)
    enc = _encode_rgbe(z)
    assert (enc == 0).all()
    np.testing.assert_array_equal(_decode_rgbe(enc), z)


def test_hdr_rle_scanlines(tmp_path):
    """Hand-build an adaptive-RLE file: run + literal segments."""
    w, h = 16, 2
    row = np.zeros((w, 4), np.uint8)
    row[:, 0] = 100  # constant red channel -> run
    row[:, 1] = np.arange(w)  # ramp green -> literal
    row[:, 2] = 7
    row[:, 3] = 128 + 1  # exponent

    def rle_channel(vals):
        # one run if constant else one literal block
        if (vals == vals[0]).all():
            return bytes([128 + len(vals), int(vals[0])])
        return bytes([len(vals)]) + bytes(vals.tolist())

    payload = b""
    for _ in range(h):
        payload += bytes([2, 2, (w >> 8) & 0xFF, w & 0xFF])
        for c in range(4):
            payload += rle_channel(row[:, c])

    p = tmp_path / "rle.hdr"
    with open(p, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(payload)

    out = read_hdr(str(p))
    assert out.shape == (h, w, 3)
    expected = _decode_rgbe(np.broadcast_to(row, (h, w, 4)))
    np.testing.assert_allclose(out, expected)


# ---------------------------------------------------------------------------
# glTF


def _make_glb(tmp_path, *, indexed=True, with_normals=True, name="m.glb",
              material=None, node_extra=None):
    """Synthesize a single-quad GLB (two triangles in the XY plane)."""
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    blobs = [pos.tobytes(), nrm.tobytes(), idx.tobytes()]
    offsets, bin_data = [], b""
    for b in blobs:
        offsets.append(len(bin_data))
        bin_data += b + b"\x00" * (-len(b) % 4)

    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
         "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
        {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
        {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
    ]
    attrs = {"POSITION": 0}
    if with_normals:
        attrs["NORMAL"] = 1
    prim = {"attributes": attrs, "mode": 4}
    if indexed:
        prim["indices"] = 2

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [dict({"mesh": 0}, **(node_extra or {}))],
        "meshes": [{"primitives": [prim]}],
        "accessors": accessors,
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": len(blobs[0])},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": len(blobs[1])},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": len(blobs[2])},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }
    if material is not None:
        gltf["materials"] = [material]
        prim["material"] = 0

    if not indexed:
        # expand to a triangle soup
        soup = pos[idx]
        nsoup = nrm[idx]
        blobs = [soup.tobytes(), nsoup.tobytes()]
        offsets, bin_data = [], b""
        for b in blobs:
            offsets.append(len(bin_data))
            bin_data += b + b"\x00" * (-len(b) % 4)
        gltf["accessors"] = [
            {"bufferView": 0, "componentType": 5126, "count": 6, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 6, "type": "VEC3"},
        ]
        gltf["bufferViews"] = [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": len(blobs[0])},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": len(blobs[1])},
        ]
        gltf["buffers"] = [{"byteLength": len(bin_data)}]
        prim.pop("indices", None)
        prim["attributes"] = {"POSITION": 0}
        if with_normals:
            prim["attributes"]["NORMAL"] = 1
        else:
            gltf["accessors"] = gltf["accessors"][:1]
            gltf["bufferViews"] = gltf["bufferViews"][:1]

    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    glb = (
        struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(bin_data))
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(bin_data), 0x004E4942) + bin_data
    )
    p = tmp_path / name
    p.write_bytes(glb)
    return str(p)


def test_glb_basic(tmp_path):
    path = _make_glb(tmp_path)
    meshes = load_gltf(path, normalize=False)
    assert len(meshes) == 1
    m = meshes[0]
    assert m.positions.shape == (4, 3)
    assert m.indices.shape == (2, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4)


def test_glb_material_mapping(tmp_path):
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.5, 0.25, 0.125, 1.0],
            "metallicFactor": 0.75,
            "roughnessFactor": 0.3,
        },
        "emissiveFactor": [1.0, 0.5, 0.0],
    }
    meshes = load_gltf(_make_glb(tmp_path, material=mat), normalize=False)
    m = meshes[0].material
    assert m.color == (0.5, 0.25, 0.125)
    assert m.metalness == 0.75 and m.roughness == 0.3
    assert m.emission_color == (1.0, 0.5, 0.0) and m.emission_strength == 1.0


def test_glb_material_override(tmp_path):
    white = Material(color=(1, 1, 1))
    meshes = load_gltf(_make_glb(tmp_path), material_override=white, normalize=False)
    assert meshes[0].material is white


def test_glb_non_indexed_no_normals(tmp_path):
    path = _make_glb(tmp_path, indexed=False, with_normals=False)
    meshes = load_gltf(path, normalize=False)
    m = meshes[0]
    assert m.positions.shape == (6, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 6, atol=1e-6)


def test_glb_normalize_and_transform(tmp_path):
    # scale 4x + translate: normalization must bring it back to unit extent
    path = _make_glb(
        tmp_path,
        node_extra={"translation": [10, 3, -2], "scale": [4, 4, 4]},
    )
    meshes = load_gltf(path, normalize=True)
    m = meshes[0]
    world = m.positions @ m.transform[:3, :3].T + m.transform[:3, 3]
    extent = world.max(0) - world.min(0)
    assert abs(extent.max() - 1.0) < 1e-6
    assert abs(world.min(0)[1]) < 1e-6  # base at ground
    center = (world.max(0) + world.min(0)) / 2
    assert abs(center[0]) < 1e-6 and abs(center[2]) < 1e-6


def test_gltf_unsupported_draco_variant_gated(tmp_path):
    """An edgebreaker-encoded Draco primitive fails with a clear message
    (only the sequential method is implemented; see tests/test_draco.py for
    the supported decode paths)."""
    import json as _json

    from tpu_pathtracer.io import draco as _draco

    if not _draco.available():
        pytest.skip("native draco codec unavailable")
    from tpu_pathtracer.io.gltf import save_glb
    from tpu_pathtracer.scene import primitives as prims
    from tpu_pathtracer.scene.host import Material, Mesh

    v, n, f = prims.sphere(0.5, 8, 4)
    p2 = tmp_path / "draco.glb"
    save_glb([Mesh(v, n, f, Material())], str(p2), draco=True)
    # flip the Draco stream's encoder_method byte to MESH_EDGEBREAKER: the
    # stream is now misdeclared and the CLERS parser must reject it with a
    # clean GLTFError (the byte after the method is not a valid traversal)
    data = bytearray(p2.read_bytes())
    at = data.find(b"DRACO")
    assert at > 0 and data[at + 8] == 0
    data[at + 8] = 1
    p2.write_bytes(bytes(data))
    with pytest.raises(GLTFError, match="decode failed"):
        load_gltf(str(p2))


def test_glb_renders_end_to_end(tmp_path):
    """Imported model drops into the scene and renders (import pipeline
    parity with src/main.ts:246-302)."""
    import tpu_pathtracer as pt
    from tpu_pathtracer.ops.trace import render_frame
    from tpu_pathtracer.scene.envmap import gradient_sky
    from tpu_pathtracer.scene.types import Camera, RenderParams

    sc = pt.Scene()
    for m in load_gltf(_make_glb(tmp_path), material_override=Material()):
        sc.add(m)
    sc.set_environment(gradient_sky(16, 32))
    data = sc.compile()
    cam = Camera.create(position=(0, 0.5, 3), look_at=(0, 0.5, 0), fov=45)
    img = np.asarray(render_frame(
        data, RenderParams.create(cam, frame=1),
        width=16, height=16, aspect=1.0, samples_per_frame=1, max_bounces=2,
    ))
    assert np.isfinite(img).all() and img.max() > 0


def test_glb_save_load_roundtrip(tmp_path):
    """save_glb -> load_gltf round trip preserves geometry, transforms, and
    material factors (export is net-new vs the import-only reference)."""
    import math

    from tpu_pathtracer.io.gltf import save_glb
    from tpu_pathtracer.scene import primitives
    from tpu_pathtracer.scene.host import rotation_y, translation

    p, n, i = primitives.torus_knot(0.5, 0.2, 32, 8)
    mat = Material(color=(0.9, 0.6, 0.1), roughness=0.3, metalness=0.8,
                   emission_color=(1, 0.5, 0), emission_strength=2.0)
    mesh = Mesh2(p, n, i, mat, transform=translation(1, 2, 3) @ rotation_y(0.5))
    path = str(tmp_path / "knot.glb")
    save_glb([mesh], path)

    out = load_gltf(path, normalize=False)
    assert len(out) == 1
    m2 = out[0]
    np.testing.assert_allclose(m2.positions, p, rtol=1e-6)
    np.testing.assert_allclose(m2.normals, n, atol=1e-6)
    np.testing.assert_array_equal(m2.indices, i.astype(np.int64))
    np.testing.assert_allclose(m2.transform, mesh.transform, atol=1e-6)
    assert m2.material.color == pytest.approx((0.9, 0.6, 0.1))
    assert m2.material.metalness == pytest.approx(0.8)
    assert m2.material.emission_strength == pytest.approx(2.0)


def test_gltf_no_scenes_key_roots(tmp_path):
    """Without a 'scenes' key, roots are nodes unreferenced as children —
    child meshes must not be emitted twice."""
    import json as _json
    import struct as _struct

    path = _make_glb(tmp_path)
    data = bytearray(open(path, "rb").read())
    jlen, = _struct.unpack_from("<I", data, 12)
    js = _json.loads(bytes(data[20:20 + jlen]))
    del js["scenes"]; del js["scene"]
    # parent node with a transform; the mesh node becomes its child
    js["nodes"] = [{"children": [1], "translation": [5, 0, 0]},
                   {"mesh": 0}]
    njs = _json.dumps(js).encode(); njs += b" " * (-len(njs) % 4)
    bin_part = bytes(data[20 + jlen:])
    out = (_struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(njs) + len(bin_part))
           + _struct.pack("<II", len(njs), 0x4E4F534A) + njs + bin_part)
    p2 = tmp_path / "noscene.glb"
    p2.write_bytes(out)
    meshes = load_gltf(str(p2), normalize=False)
    assert len(meshes) == 1  # emitted once, via the parent
    np.testing.assert_allclose(meshes[0].transform[:3, 3], [5, 0, 0])
