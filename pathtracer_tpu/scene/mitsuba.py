"""Mitsuba 0.5 XML scene importer.

Parity with reference ``src/common/importer/mitsuba.rs`` (data model
:368-683, camera :685-710) and ``src/pathtracer/importer/mitsuba.rs``
(BSDF→material map :84-181, shapes→meshes+per-tri area lights :183-331,
envmap/sunsky emitters :362-420), built on ``xml.etree`` and numpy and
emitting packed device arrays instead of a pointer graph.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from ..core.camera import Camera
from . import meshgen
from .scene import (MAT_GLASS, MAT_MATTE, MAT_METAL, MAT_MIRROR,
                    MAT_ROUGHGLASS, MAT_SUBSTRATE, SceneBuilder, SceneData)


def _floats(el) -> dict[str, float]:
    return {c.get("name"): float(c.get("value"))
            for c in el.findall("float")}


def _integers(el) -> dict[str, int]:
    return {c.get("name"): int(c.get("value"))
            for c in el.findall("integer")}


def _strings(el) -> dict[str, str]:
    return {c.get("name"): c.get("value") for c in el.findall("string")}


def _rgbs(el) -> dict[str, np.ndarray]:
    out = {}
    for c in el.findall("rgb"):
        vals = [float(x) for x in c.get("value").replace(",", " ").split()]
        out[c.get("name")] = np.asarray(vals, np.float32)
    return out


def _matrix(el) -> np.ndarray:
    """<transform><matrix value="..."/></transform> → (4,4) row-major."""
    m = el.find("matrix")
    vals = [float(x) for x in m.get("value").split()]
    return np.asarray(vals, np.float64).reshape(4, 4)


def schlick_r0_from_eta(eta: float) -> float:
    return (eta - 1.0) ** 2 / (eta + 1.0) ** 2


def _texture_from_el(builder: SceneBuilder, el, scene_dir: str = ".") -> int:
    """Parse a nested <texture> into a descriptor id, or -1.

    Ref pathtracer/importer/mitsuba.rs:24-67: checkerboard with UVMap
    scale/offset; bitmap with the v-flip UVMap(1,-1,0,0) quirk and sRGB
    decode.
    """
    tex = el.find("texture")
    if tex is None:
        return -1
    kind = tex.get("type")
    if kind == "checkerboard":
        rgbs = _rgbs(tex)
        floats = _floats(tex)
        return builder.add_texture_checker(
            rgbs.get("color0", np.zeros(3, np.float32)),
            rgbs.get("color1", np.ones(3, np.float32)),
            uv=(floats.get("uscale", 1.0), floats.get("vscale", 1.0),
                floats.get("uoffset", 0.0), floats.get("voffset", 0.0)))
    if kind == "bitmap":
        from ..utils.image import read_png
        fname = _strings(tex)["filename"]
        path = os.path.join(scene_dir, fname)
        if fname.lower().endswith(".png") and os.path.exists(path):
            img = read_png(path).astype(np.float32)[..., :3] / 255.0
            return builder.add_texture_image(
                img, uv=(1.0, -1.0, 0.0, 0.0), srgb=True)
    return -1


def _material_from_bsdf(builder: SceneBuilder, el) -> int:
    """Map a Mitsuba BSDF element to a material-table row.

    Ref pathtracer/importer/mitsuba.rs:84-181: twosided unwraps; diffuse→
    Matte, conductor(none)→Mirror, (rough)conductor→Metal, dielectric→Glass,
    (rough)plastic→Substrate with Schlick r0.
    """
    kind = el.get("type")
    if kind == "twosided":
        return _material_from_bsdf(builder, el.find("bsdf"))
    rgbs = _rgbs(el)
    floats = _floats(el)
    strings = _strings(el)
    if kind == "diffuse":
        kd = rgbs.get("reflectance", np.ones(3, np.float32))
        kd_tx = _texture_from_el(builder, el)
        return builder.add_material(mtype=MAT_MATTE, kd=kd, kd_tx=kd_tx)
    if kind in ("conductor", "roughconductor"):
        if strings.get("material") == "none":
            return builder.add_material(mtype=MAT_MIRROR)
        alpha = floats.get("alpha", 0.001)
        return builder.add_material(
            mtype=MAT_METAL,
            eta=rgbs.get("eta", np.full(3, 0.2, np.float32)),
            k=rgbs.get("k", np.full(3, 3.9, np.float32)),
            ks=rgbs.get("specular_reflectance", np.ones(3, np.float32)),
            rough=(alpha, alpha), remap=False)
    if kind == "dielectric":
        ior = floats.get("int_ior", 1.5)
        return builder.add_material(
            mtype=MAT_GLASS, kd=np.ones(3, np.float32),
            ks=np.ones(3, np.float32), eta=(ior, ior, ior))
    if kind == "roughdielectric":
        # EXTENSION beyond the reference's map (mitsuba.rs:84-181 has no
        # roughdielectric arm): glossy dielectric via the ROUGHGLASS
        # material (MicrofacetReflection + MicrofacetTransmission)
        ior = floats.get("int_ior", 1.5)
        alpha = floats.get("alpha", 0.1)
        return builder.add_material(
            mtype=MAT_ROUGHGLASS, kd=np.ones(3, np.float32),
            ks=np.ones(3, np.float32), eta=(ior, ior, ior),
            rough=(alpha, alpha), remap=False)
    if kind in ("plastic", "roughplastic"):
        alpha = floats.get("alpha", 0.001) if kind == "roughplastic" else 0.001
        r0 = schlick_r0_from_eta(floats.get("int_ior", 1.49))
        return builder.add_material(
            mtype=MAT_SUBSTRATE,
            kd=rgbs.get("diffuse_reflectance", np.full(3, 0.5, np.float32)),
            ks=np.full(3, r0, np.float32),
            rough=(alpha, alpha), remap=False)
    raise ValueError(f"unsupported bsdf type: {kind}")


# rotation fixing mitsuba's convention (ref mitsuba.rs:690-699): post-rotate
# the camera frame by pi about +y
_ROT_Y_PI = np.diag([-1.0, 1.0, -1.0, 1.0])

# envmap orientation fix (ref pathtracer/importer/mitsuba.rs:365-372):
# euler(-pi/2, -pi/2, 0) then z-flip
def _env_light_to_world() -> np.ndarray:
    a, b = -np.pi / 2, -np.pi / 2
    rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                   [0, np.sin(a), np.cos(a)]])
    ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                   [-np.sin(b), 0, np.cos(b)]])
    m = np.eye(4)
    # nalgebra from_euler_angles(r, p, y) = Rz(y) * Ry(p) * Rx(r); here yaw=0
    m[:3, :3] = (ry @ rx) @ np.diag([1.0, 1.0, -1.0])
    return m


def _get_camera(sensor, resolution) -> Camera:
    """Ref common/importer/mitsuba.rs:685-710."""
    floats = _floats(sensor)
    film = sensor.find("film")
    fw = _integers(film)["width"] if film is not None else resolution[0]
    fh = _integers(film)["height"] if film is not None else resolution[1]
    fov = np.radians(floats["fov"])
    to_world = _matrix(sensor.find("transform"))
    cam_to_world = to_world @ _ROT_Y_PI
    # normalize any scaling out of the rotation part (set_scaling(1.0))
    r = cam_to_world[:3, :3]
    scale = np.cbrt(abs(np.linalg.det(r)))
    if scale > 0:
        cam_to_world = cam_to_world.copy()
        cam_to_world[:3, :3] = r / scale
    aspect = resolution[0] / resolution[1]
    fovy = fov * (fh / fw)
    return Camera.create(cam_to_world, aspect, fovy, resolution,
                         znear=0.01, zfar=10000.0)


def load_mitsuba(path: str, resolution=None):
    """Parse a Mitsuba XML scene → (Camera, SceneData, settings dict).

    settings carries the scene's own integrator/sampler/film blocks
    (max_depth, spp, film size) which the reference parses but ignores
    (SURVEY §5 config notes); the CLI may use them as defaults.
    """
    tree = ET.parse(path)
    root = tree.getroot()
    scene_dir = os.path.dirname(os.path.abspath(path))

    settings: dict = {}
    integrator = root.find("integrator")
    if integrator is not None:
        settings["max_depth"] = _integers(integrator).get("maxDepth")
    sensor = root.find("sensor")
    sampler = sensor.find("sampler") if sensor is not None else None
    if sampler is not None:
        settings["spp"] = _integers(sampler).get("sampleCount")
    film = sensor.find("film") if sensor is not None else None
    if film is not None:
        ints = _integers(film)
        settings["film"] = (ints.get("width"), ints.get("height"))

    if resolution is None:
        resolution = settings.get("film") or (640, 480)

    camera = _get_camera(sensor, resolution)

    builder = SceneBuilder()
    materials_by_id: dict[str, int] = {}
    for bsdf in root.findall("bsdf"):
        mid = bsdf.get("id")
        materials_by_id[mid] = _material_from_bsdf(builder, bsdf)

    for shape in root.findall("shape"):
        kind = shape.get("type")
        transform_el = shape.find("transform")
        matrix = _matrix(transform_el) if transform_el is not None else np.eye(4)
        if kind == "rectangle":
            pos, idx, nrm, uv = meshgen.gen_rectangle()
        elif kind == "cube":
            pos, idx, nrm, uv = meshgen.gen_cube()
        elif kind == "sphere":
            center = np.zeros(3)
            pt = shape.find("point")
            if pt is not None:
                center = np.array([float(pt.get("x")), float(pt.get("y")),
                                   float(pt.get("z"))])
            radius = _floats(shape).get("radius", 1.0)
            pos, idx, nrm, uv = meshgen.gen_sphere(center, radius)
            matrix = np.eye(4)  # sphere is positioned by center/radius
        elif kind == "obj":
            fname = _strings(shape)["filename"]
            pos, idx, nrm, uv = meshgen.load_obj(os.path.join(scene_dir, fname))
            booleans = {c.get("name"): c.get("value")
                        for c in shape.findall("boolean")}
            if booleans.get("faceNormals") == "true":
                nrm = None  # ref: vertex normals disregarded
        else:
            raise ValueError(f"unsupported shape type: {kind}")

        pos, nrm = meshgen.transform_mesh(pos, nrm, matrix)

        ref_el = shape.find("ref")
        bsdf_el = shape.find("bsdf")
        if ref_el is not None:
            mat_id = materials_by_id[ref_el.get("id")]
        elif bsdf_el is not None:
            mat_id = _material_from_bsdf(builder, bsdf_el)
        else:
            raise ValueError("shape needs a material ref or inline bsdf")

        emission = None
        emitter = shape.find("emitter")
        if emitter is not None and emitter.get("type") == "area":
            emission = _rgbs(emitter)["radiance"]

        builder.add_mesh(pos, idx, nrm, uv, mat_id, emission)

    for emitter in root.findall("emitter"):
        kind = emitter.get("type")
        if kind == "envmap":
            from ..utils.image import read_hdr
            fname = _strings(emitter)["filename"]
            img = read_hdr(os.path.join(scene_dir, fname))
            to_world = _matrix(emitter.find("transform")) \
                if emitter.find("transform") is not None else np.eye(4)
            builder.set_environment(img, (to_world @ _env_light_to_world())[:3, :3])
        elif kind == "sunsky":
            # ref falls back to the default hdr map (mitsuba.rs:400-418)
            from ..utils.image import read_hdr
            default = os.path.join(os.path.dirname(__file__), "..", "..",
                                   "data", "abandoned_tank_farm_04_1k.hdr")
            if os.path.exists(default):
                img = read_hdr(default)
                builder.set_environment(img, _env_light_to_world()[:3, :3])

    return camera, builder.build(), settings
