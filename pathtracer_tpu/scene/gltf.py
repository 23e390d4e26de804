"""glTF 2.0 scene importer (pure Python: JSON + binary buffers + GLB).

Parity with reference ``src/common/importer/gltf.rs`` (camera search with
accumulated TRS transforms :3-64, default look-at-world-bound camera
:66-82) and ``src/pathtracer/importer/gltf.rs`` (material map :167-289:
transmission==1→Glass, alpha-blend→Glass(1.33), metallic==1∧roughness==0→
Mirror, else Disney; emissive ×10 scaling hack with per-triangle area
lights :391-450; KHR_lights_punctual :465-492; --default_lights envmap
:550-565; world pre-transformed meshes :332-376).

PNG base-color and metallic-roughness textures load into the mip-pyramid
texture pool (channel-split metallic=B/roughness=G, gltf.rs:99-165);
other image formats fall back to their factors; normal maps bind through
the NormalMaterial-equivalent shading-frame perturbation. Alpha-mask
cutouts import from RGBA base-color alpha when alphaMode == MASK
(gltf.rs:291-330; see ``_material_row`` below).
"""

from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from ..core.camera import Camera
from ..utils.logging import get_logger
from .scene import (MAT_DISNEY, MAT_GLASS, MAT_MATTE, MAT_MIRROR,
                    SceneBuilder)

log = get_logger("scene")

_COMPONENT_DTYPE = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16, 5123: np.uint16,
    5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNT = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}

EMISSIVE_SCALING_FACTOR = 10.0  # ref importer/gltf.rs:391 gltf clamp hack
DEFAULT_Z_NEAR, DEFAULT_Z_FAR = 0.01, 1000.0


class GLTFFile:
    def __init__(self, path: str):
        self.dir = os.path.dirname(os.path.abspath(path))
        blob = open(path, "rb").read()
        if blob[:4] == b"glTF":  # GLB container
            _, _, _ = struct.unpack("<III", blob[:12])
            off = 12
            self.json = None
            self.bin = None
            while off < len(blob):
                clen, ctype = struct.unpack("<II", blob[off:off + 8])
                data = blob[off + 8:off + 8 + clen]
                if ctype == 0x4E4F534A:  # JSON
                    self.json = json.loads(data)
                elif ctype == 0x004E4942:  # BIN
                    self.bin = data
                off += 8 + clen
        else:
            self.json = json.loads(blob)
            self.bin = None
        self._buffers: dict[int, bytes] = {}

    def buffer(self, idx: int) -> bytes:
        if idx not in self._buffers:
            buf = self.json["buffers"][idx]
            uri = buf.get("uri")
            if uri is None:
                data = self.bin
            elif uri.startswith("data:"):
                data = base64.b64decode(uri.split(",", 1)[1])
            else:
                data = open(os.path.join(self.dir, uri), "rb").read()
            self._buffers[idx] = data
        return self._buffers[idx]

    def accessor(self, idx: int) -> np.ndarray:
        acc = self.json["accessors"][idx]
        count = acc["count"]
        ncomp = _TYPE_COUNT[acc["type"]]
        dtype = _COMPONENT_DTYPE[acc["componentType"]]
        itemsize = np.dtype(dtype).itemsize * ncomp
        if "bufferView" not in acc:
            out = np.zeros((count, ncomp), dtype)
        else:
            bv = self.json["bufferViews"][acc["bufferView"]]
            data = self.buffer(bv["buffer"])
            start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = bv.get("byteStride", itemsize)
            if stride == itemsize:
                out = np.frombuffer(
                    data, dtype, count * ncomp, start).reshape(count, ncomp)
            else:
                raw = np.frombuffer(
                    data, np.uint8, count * stride, start).reshape(count, stride)
                out = raw[:, :itemsize].copy().view(dtype).reshape(count, ncomp)
        if acc.get("normalized") and dtype != np.float32:
            info = np.iinfo(dtype)
            out = out.astype(np.float32) / info.max
        return out


def _node_transform(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    t = np.eye(4)
    if "translation" in node:
        t[:3, 3] = node["translation"]
    r = np.eye(4)
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r[:3, :3] = _quat_to_mat(x, y, z, w)
    s = np.eye(4)
    if "scale" in node:
        s[0, 0], s[1, 1], s[2, 2] = node["scale"]
    return t @ r @ s


def _quat_to_mat(x, y, z, w):
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _load_texture_image(gf: "GLTFFile", tex_index: int):
    """Decode a glTF texture's image (PNG or JPEG, by file path or
    embedded bufferView/data URI) → float array or None.
    Parity: importer/gltf.rs:99-165 loads any image-crate format; glTF
    mandates PNG + JPEG, which is what we decode."""
    from ..utils.image import decode_image_bytes, read_jpeg, read_png
    try:
        tex = gf.json["textures"][tex_index]
        img = gf.json["images"][tex["source"]]
        if "uri" in img and not img["uri"].startswith("data:"):
            path = os.path.join(gf.dir, img["uri"])
            low = path.lower()
            if low.endswith(".png"):
                return read_png(path).astype(np.float32) / 255.0
            if low.endswith((".jpg", ".jpeg")):
                return read_jpeg(path).astype(np.float32) / 255.0
            return None
        if "uri" in img:  # data: URI
            import base64
            blob = base64.b64decode(img["uri"].split(",", 1)[1])
            return decode_image_bytes(
                blob, img.get("mimeType", "")).astype(np.float32) / 255.0
        if "bufferView" in img:
            bv = gf.json["bufferViews"][img["bufferView"]]
            data = gf.buffer(bv["buffer"])
            blob = data[bv.get("byteOffset", 0):
                        bv.get("byteOffset", 0) + bv["byteLength"]]
            return decode_image_bytes(
                blob, img.get("mimeType", "")).astype(np.float32) / 255.0
    except Exception:  # noqa: BLE001 — unsupported image formats fall back
        log.warning("unsupported image format for texture %d", tex_index)
    return None


def _material_row(builder: SceneBuilder, mat: dict,
                  gf: "GLTFFile | None" = None) -> tuple[int, int]:
    """Reference material map (pathtracer/importer/gltf.rs:167-289).

    Returns (material row, alpha-mask texture descriptor or -1). The mask
    is the base-color texture's alpha channel when alphaMode == MASK
    (importer/gltf.rs:291-330; the reference tests it for exact 0 at hits,
    shape.rs:228-244 — alphaCutoff is ignored there too)."""
    pbr = mat.get("pbrMetallicRoughness", {})
    base = pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])
    # from_slice_4(..., true): sRGB-decode the color factor. Pure numpy —
    # the jnp version would dispatch a device op per material at import
    # time (a 100s+ stall when another process holds the TPU).
    b3 = np.asarray(base[:3], np.float32)
    color = np.where(b3 <= 0.04045, b3 / 12.92,
                     np.power((b3 + 0.055) / 1.055, 2.4)).astype(np.float32)
    ior = mat.get("extensions", {}).get("KHR_materials_ior", {}) \
        .get("ior", 1.5)
    transmission = mat.get("extensions", {}) \
        .get("KHR_materials_transmission", {}).get("transmissionFactor", 0.0)
    alpha_txd = -1
    if gf is not None and mat.get("alphaMode") == "MASK" \
            and "baseColorTexture" in pbr:
        img = _load_texture_image(gf, pbr["baseColorTexture"]["index"])
        if img is not None and img.shape[-1] == 4:
            alpha = np.repeat(img[..., 3:4], 3, axis=-1)
            alpha_txd = builder.add_texture_image(alpha)
    if transmission == 1.0:
        return builder.add_material(mtype=MAT_GLASS, kd=(1, 1, 1),
                                    ks=(1, 1, 1), eta=(ior,) * 3), alpha_txd
    alpha = base[3]
    if mat.get("alphaMode") == "BLEND" and alpha < 1.0:
        kt = 1.0 - alpha * color
        return builder.add_material(mtype=MAT_GLASS, kd=(1, 1, 1),
                                    ks=tuple(kt), eta=(1.33,) * 3), alpha_txd
    metallic = pbr.get("metallicFactor", 1.0)
    roughness = pbr.get("roughnessFactor", 1.0)
    if metallic == 1.0 and roughness == 0.0:
        return builder.add_material(mtype=MAT_MIRROR), alpha_txd
    kd_tx = metallic_tx = rough_tx = normal_tx = -1
    if gf is not None and "normalTexture" in mat:
        img = _load_texture_image(gf, mat["normalTexture"]["index"])
        if img is not None:
            normal_tx = builder.add_texture_image(img[..., :3])
    if gf is not None and "baseColorTexture" in pbr:
        img = _load_texture_image(gf, pbr["baseColorTexture"]["index"])
        if img is not None:
            # scale by the (sRGB-decoded) color factor (gltf.rs:167-181)
            kd_tx = builder.add_texture_image(
                img[..., :3], scale=tuple(color), srgb=True)
    if gf is not None and "metallicRoughnessTexture" in pbr:
        img = _load_texture_image(
            gf, pbr["metallicRoughnessTexture"]["index"])
        if img is not None:
            # channel split: metallic=B, roughness=G (gltf.rs:99-165)
            metallic_tx = builder.add_texture_image(
                img[..., :3], scale=(metallic,) * 3, channel=2)
            rough_tx = builder.add_texture_image(
                img[..., :3], scale=(roughness,) * 3, channel=1)
    return builder.add_material(
        mtype=MAT_DISNEY, kd=tuple(color),
        eta=(ior,) * 3, misc=(metallic, roughness, 0.0, 0.0),
        kd_tx=kd_tx, metallic_tx=metallic_tx, rough_tx=rough_tx,
        normal_tx=normal_tx), alpha_txd


def load_gltf(path: str, resolution=None, default_lights: bool = False):
    """Parse a glTF/GLB scene → (Camera, SceneData, settings dict)."""
    gf = GLTFFile(path)
    doc = gf.json
    resolution = resolution or (640, 480)

    builder = SceneBuilder()
    # default material at slot 0 (ref from_gltf:520: default_material first)
    builder.add_material(mtype=MAT_MATTE, kd=(0.5, 0.5, 0.5))
    alpha_by_mrow = {}
    for mat in doc.get("materials", []):
        mrow, a_txd = _material_row(builder, mat, gf)
        alpha_by_mrow[mrow] = a_txd

    cam_result = {}

    def visit(node_idx: int, parent: np.ndarray):
        node = doc["nodes"][node_idx]
        xf = parent @ _node_transform(node)
        if "camera" in node and "camera" not in cam_result:
            cam = doc["cameras"][node["camera"]]
            if cam.get("type") == "perspective":
                p = cam["perspective"]
                cam_result["camera"] = (xf, p.get("yfov", np.pi / 2),
                                        p.get("znear", DEFAULT_Z_NEAR),
                                        p.get("zfar", DEFAULT_Z_FAR))
        if "mesh" in node:
            mesh = doc["meshes"][node["mesh"]]
            for prim in mesh.get("primitives", []):
                if prim.get("mode", 4) != 4:
                    continue  # triangles only
                attrs = prim["attributes"]
                pos = gf.accessor(attrs["POSITION"]).astype(np.float32)
                idxs = gf.accessor(prim["indices"]).astype(np.int64) \
                    if "indices" in prim else \
                    np.arange(len(pos), dtype=np.int64)[:, None]
                idxs = idxs.reshape(-1, 3) if idxs.shape[-1] != 3 else idxs
                normals = gf.accessor(attrs["NORMAL"]).astype(np.float32) \
                    if "NORMAL" in attrs else None
                uvs = gf.accessor(attrs["TEXCOORD_0"]).astype(np.float32) \
                    if "TEXCOORD_0" in attrs else None

                from .meshgen import transform_mesh
                pos_w, nrm_w = transform_mesh(pos, normals, xf)

                mat_idx = prim.get("material")
                mrow = 0 if mat_idx is None else mat_idx + 1

                emission = None
                if mat_idx is not None:
                    ef = doc["materials"][mat_idx].get(
                        "emissiveFactor", [0.0, 0.0, 0.0])
                    if any(v != 0.0 for v in ef):
                        # NOTE: mirrors the reference using component [0]
                        # for all three channels (importer/gltf.rs:396-401)
                        emission = np.full(
                            3, EMISSIVE_SCALING_FACTOR * ef[0], np.float32)
                builder.add_mesh(pos_w, idxs, nrm_w, uvs, mrow, emission,
                                 alpha_txd=alpha_by_mrow.get(mrow, -1))
        if "extensions" in node and \
                "KHR_lights_punctual" in node["extensions"]:
            li = node["extensions"]["KHR_lights_punctual"]["light"]
            light = doc["extensions"]["KHR_lights_punctual"]["lights"][li]
            color = light.get("color", [1, 1, 1])
            intensity = light.get("intensity", 1.0)
            # mirrors reference color[0] broadcast (importer/gltf.rs:466-470)
            c = np.full(3, intensity * color[0], np.float32)
            if light.get("type") == "directional":
                d = (xf[:3, :3] @ np.array([0.0, 0.0, -1.0]))
                builder.add_distant_light(d, c)
            else:  # point & spot→point (ref :480-490)
                builder.add_point_light(xf[:3, 3], c)
        for child in node.get("children", []):
            visit(child, xf)

    scene_idx = doc.get("scene", 0)
    for node_idx in doc.get("scenes", [{}])[scene_idx].get("nodes", []):
        visit(node_idx, np.eye(4))

    if default_lights:
        from ..utils.image import read_hdr
        hdr = os.path.join(os.path.dirname(__file__), "..", "..", "data",
                           "abandoned_tank_farm_04_1k.hdr")
        if os.path.exists(hdr):
            # env light z-up → y-up: rotX(-pi/2) (ref from_gltf:554-563)
            a = -np.pi / 2
            rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                           [0, np.sin(a), np.cos(a)]])
            builder.set_environment(read_hdr(hdr), rx)

    scene = builder.build()

    if "camera" in cam_result:
        xf, yfov, znear, zfar = cam_result["camera"]
        # orthonormalize (try_convert to isometry semantics)
        r = xf[:3, :3]
        u, _, vt = np.linalg.svd(r)
        c2w = np.eye(4)
        c2w[:3, :3] = u @ vt
        c2w[:3, 3] = xf[:3, 3]
        camera = Camera.create(c2w, resolution[0] / resolution[1], yfov,
                               resolution, znear, zfar)
    else:
        # default look-at-world-bound camera (common/importer/gltf.rs:66-82)
        p_max = np.asarray(scene.world_center) + np.asarray(scene.world_radius)
        camera = Camera.look_at(
            p_max, [0, 0, 0], [0, 1, 0],
            (np.pi / 2) * (resolution[1] / resolution[0]), resolution,
            DEFAULT_Z_NEAR, DEFAULT_Z_FAR)

    return camera, scene, {}
