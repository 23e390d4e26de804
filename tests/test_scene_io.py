"""Scene importer tests: Mitsuba XML parse + generated glTF round trip."""

import base64
import json
import os

import numpy as np
import pytest

from pathtracer_tpu.scene.mitsuba import load_mitsuba
from pathtracer_tpu.scene.scene import (MAT_DISNEY, MAT_GLASS, MAT_MATTE,
                                        MAT_MIRROR)


def test_mitsuba_cornell():
    cam, scene, settings = load_mitsuba("data/cornell-box.xml",
                                        resolution=(64, 64))
    assert settings["max_depth"] == 65 and settings["spp"] == 64
    assert scene.p0.shape == (36, 3)  # 5 rects*2 + 2 cubes*12 + light*2
    assert int(scene.n_lights) == 2  # one DiffuseAreaLight per light tri
    np.testing.assert_allclose(cam.cam_to_world[:3, 3], [0, 1, 6.8],
                               atol=1e-5)
    np.testing.assert_allclose(cam.cam_to_world[:3, :3], np.eye(3), atol=1e-5)
    # light faces down (-y): mesh normals transformed through the matrix
    light_tris = np.asarray(scene.light_tri)
    n = np.asarray(scene.n0)[light_tris[0]]
    assert n[1] < 0


def _make_gltf(tmp_path, materials, mesh_mat=0, emissive=None):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.uint16)
    pos_b = pos.tobytes()
    idx_b = idx.tobytes()
    pad = (4 - len(idx_b) % 4) % 4
    blob = pos_b + idx_b + b"\x00" * pad
    mats = list(materials)
    if emissive is not None:
        mats[mesh_mat] = dict(mats[mesh_mat])
        mats[mesh_mat]["emissiveFactor"] = emissive
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1,
            "material": mesh_mat}]}],
        "materials": mats,
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b)},
            {"buffer": 0, "byteOffset": len(pos_b), "byteLength": len(idx_b)},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }],
    }
    p = os.path.join(tmp_path, "test.gltf")
    json.dump(doc, open(p, "w"))
    return p


def test_gltf_material_map(tmp_path):
    from pathtracer_tpu.scene.gltf import load_gltf
    cases = [
        ({"pbrMetallicRoughness": {"metallicFactor": 1.0,
                                   "roughnessFactor": 0.0}}, MAT_MIRROR),
        ({"pbrMetallicRoughness": {"baseColorFactor": [0.5, 0.5, 0.5, 0.5]},
          "alphaMode": "BLEND"}, MAT_GLASS),
        ({"extensions": {"KHR_materials_transmission":
                         {"transmissionFactor": 1.0}}}, MAT_GLASS),
        ({"pbrMetallicRoughness": {"metallicFactor": 0.3,
                                   "roughnessFactor": 0.4}}, MAT_DISNEY),
    ]
    for mat_json, want in cases:
        path = _make_gltf(str(tmp_path), [mat_json])
        cam, scene, _ = load_gltf(path)
        # slot 0 is the default material; the scene mesh uses slot 1
        assert int(scene.mat_type[1]) == want
        assert int(scene.material_id[0]) == 1


def test_gltf_emissive_creates_area_light(tmp_path):
    from pathtracer_tpu.scene.gltf import load_gltf
    path = _make_gltf(str(tmp_path),
                      [{"pbrMetallicRoughness": {}}],
                      emissive=[0.5, 0.2, 0.1])
    cam, scene, _ = load_gltf(path)
    assert int(scene.n_lights) == 1
    # x10 scaling hack, component [0] broadcast (ref importer/gltf.rs:391-401)
    np.testing.assert_allclose(np.asarray(scene.light_emit[0]),
                               [5.0, 5.0, 5.0], atol=1e-6)


def test_gltf_default_camera(tmp_path):
    from pathtracer_tpu.scene.gltf import load_gltf
    path = _make_gltf(str(tmp_path), [{"pbrMetallicRoughness": {}}])
    cam, scene, _ = load_gltf(path, resolution=(128, 96))
    assert cam.resolution == (128, 96)


def test_gltf_jpeg_texture(tmp_path):
    """A JPEG-textured GLTF must import the texture (not fall back to
    flat factors) — parity with importer/gltf.rs:99-165 which loads any
    image-crate format (glTF mandates PNG + JPEG)."""
    import io

    from PIL import Image

    from pathtracer_tpu.scene.gltf import load_gltf

    # red/blue checker JPEG, data-URI embedded
    img = np.zeros((16, 16, 3), np.uint8)
    img[:8, :8] = [255, 0, 0]
    img[8:, 8:] = [255, 0, 0]
    img[:8, 8:] = [0, 0, 255]
    img[8:, :8] = [0, 0, 255]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    jpeg_uri = ("data:image/jpeg;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.array([[0, 1, 2]], np.uint16)
    pos_b, uv_b, idx_b = pos.tobytes(), uv.tobytes(), idx.tobytes()
    blob = pos_b + uv_b + idx_b + b"\x00" * ((4 - len(idx_b) % 4) % 4)
    doc = {
        "asset": {"version": "2.0"}, "scene": 0,
        "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "indices": 2,
            "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0}}}],
        "textures": [{"source": 0}],
        "images": [{"uri": jpeg_uri}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b)},
            {"buffer": 0, "byteOffset": len(pos_b), "byteLength": len(uv_b)},
            {"buffer": 0, "byteOffset": len(pos_b) + len(uv_b),
             "byteLength": len(idx_b)},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }],
    }
    p = os.path.join(str(tmp_path), "jpeg_tex.gltf")
    json.dump(doc, open(p, "w"))
    cam, scene, _ = load_gltf(p)
    # mesh material (slot 1; slot 0 is the default) binds a kd texture
    assert int(scene.mat_kd_tx[1]) >= 0
    # the pooled level-0 image holds the checker: red and blue texels
    # both present (JPEG is lossy; allow wide tolerance)
    pool = np.asarray(scene.tex.data)
    txd = int(scene.mat_kd_tx[1])
    img_id = int(scene.txd_image[txd])
    base = int(np.asarray(scene.tex.level_offset)[img_id, 0])
    w0 = int(np.asarray(scene.tex.level_w)[img_id, 0])
    h0 = int(np.asarray(scene.tex.level_h)[img_id, 0])
    texels = pool[base:base + w0 * h0].reshape(h0, w0, 3)
    assert texels[2, 2, 0] > 0.5 and texels[2, 2, 2] < 0.3  # red corner
    assert texels[2, -3, 2] > 0.5 and texels[2, -3, 0] < 0.3  # blue corner
