"""Generate data/sponza_proc.glb — a Sponza-class benchmark scene.

A procedural colonnaded atrium in the spirit of the reference's flagship
Sponza render (/root/reference/README.md:105-107): ~120k triangles, four
textured material groups (stone floor/walls, fluted columns, hanging
fabric, alpha-masked foliage), a sun (KHR_lights_punctual directional),
fill point lights, and a perspective camera — written as a standalone
binary glTF with embedded PNG textures so the GLTF import path
(scene/gltf.py) is exercised end to end at scale.

Usage: python tools/make_sponza.py [out.glb]
"""

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtracer_tpu.utils.image import write_png  # noqa: E402

rng = np.random.default_rng(7)


# ------------------------------------------------------------- geometry
def grid_quad(nx, nz, sx, sz, uv_tiles=1.0):
    """Subdivided quad in the xz-plane, +y normal, centered at origin."""
    xs = np.linspace(-sx / 2, sx / 2, nx + 1)
    zs = np.linspace(-sz / 2, sz / 2, nz + 1)
    px, pz = np.meshgrid(xs, zs, indexing="ij")
    pos = np.stack([px, np.zeros_like(px), pz], -1).reshape(-1, 3)
    nrm = np.tile([0.0, 1.0, 0.0], (len(pos), 1))
    u, v = np.meshgrid(np.linspace(0, uv_tiles, nx + 1),
                       np.linspace(0, uv_tiles, nz + 1), indexing="ij")
    uv = np.stack([u, v], -1).reshape(-1, 2)
    idx = []
    for i in range(nx):
        for j in range(nz):
            a = i * (nz + 1) + j
            b = (i + 1) * (nz + 1) + j
            idx += [[a, b, a + 1], [b, b + 1, a + 1]]
    return pos, nrm, uv, np.asarray(idx, np.uint32)


def fluted_column(radius, height, n_seg=56, n_ring=20, flutes=12):
    """Cylinder with sinusoidal flutes along the circumference."""
    th = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    ys = np.linspace(0, height, n_ring + 1)
    tt, yy = np.meshgrid(th, ys, indexing="ij")
    r = radius * (1.0 + 0.06 * np.cos(flutes * tt))
    # slight entasis (classical taper)
    r = r * (1.0 - 0.15 * (yy / height))
    pos = np.stack([r * np.cos(tt), yy, r * np.sin(tt)], -1).reshape(-1, 3)
    nrm = np.stack([np.cos(tt), np.zeros_like(tt), np.sin(tt)],
                   -1).reshape(-1, 3)
    uv = np.stack([tt / (2 * np.pi) * 4.0, yy / height * 4.0],
                  -1).reshape(-1, 2)
    idx = []
    for i in range(n_seg):
        i2 = (i + 1) % n_seg
        for j in range(n_ring):
            a = i * (n_ring + 1) + j
            b = i2 * (n_ring + 1) + j
            idx += [[a, b, a + 1], [b, b + 1, a + 1]]
    return pos, nrm, uv, np.asarray(idx, np.uint32)


def box(sx, sy, sz, uv_scale=1.0):
    """Axis-aligned box centered at origin (y from 0 to sy)."""
    hx, hz = sx / 2, sz / 2
    pos, nrm, uv, idx = [], [], [], []
    faces = [
        ([-hx, 0, -hz], [hx, 0, -hz], [hx, sy, -hz], [-hx, sy, -hz], [0, 0, -1]),
        ([hx, 0, hz], [-hx, 0, hz], [-hx, sy, hz], [hx, sy, hz], [0, 0, 1]),
        ([-hx, 0, hz], [-hx, 0, -hz], [-hx, sy, -hz], [-hx, sy, hz], [-1, 0, 0]),
        ([hx, 0, -hz], [hx, 0, hz], [hx, sy, hz], [hx, sy, -hz], [1, 0, 0]),
        ([-hx, sy, -hz], [hx, sy, -hz], [hx, sy, hz], [-hx, sy, hz], [0, 1, 0]),
        ([-hx, 0, hz], [hx, 0, hz], [hx, 0, -hz], [-hx, 0, -hz], [0, -1, 0]),
    ]
    for a, b, c, d, n in faces:
        base = len(pos)
        pos += [a, b, c, d]
        nrm += [n] * 4
        uv += [[0, 0], [uv_scale, 0], [uv_scale, uv_scale], [0, uv_scale]]
        idx += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    return (np.asarray(pos, np.float64), np.asarray(nrm, np.float64),
            np.asarray(uv, np.float64), np.asarray(idx, np.uint32))


def arch(radius, width, n_seg=24, n_w=4, thickness=0.5):
    """Half-torus arch spanning the xz gap, apex up (+y)."""
    th = np.linspace(0, np.pi, n_seg + 1)  # 0..pi over the arch
    ws = np.linspace(-width / 2, width / 2, n_w + 1)
    tt, ww = np.meshgrid(th, ws, indexing="ij")
    # arch in the xy plane, extruded along z
    pos = np.stack([radius * np.cos(tt), radius * np.sin(tt), ww],
                   -1).reshape(-1, 3)
    nrm = np.stack([np.cos(tt), np.sin(tt), np.zeros_like(tt)],
                   -1).reshape(-1, 3)
    uv = np.stack([tt / np.pi * 3.0, (ww + width / 2) / width],
                  -1).reshape(-1, 2)
    idx = []
    for i in range(n_seg):
        for j in range(n_w):
            a = i * (n_w + 1) + j
            b = (i + 1) * (n_w + 1) + j
            idx += [[a, b, a + 1], [b, b + 1, a + 1]]
    return pos, nrm, uv, np.asarray(idx, np.uint32)


def wavy_curtain(w, h, n=24):
    """Hanging fabric: vertical grid with sinusoidal depth waves."""
    xs = np.linspace(-w / 2, w / 2, n + 1)
    ys = np.linspace(0, h, n + 1)
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    zz = 0.15 * np.sin(xx * 4.0) * (yy / h)
    pos = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    nrm = np.tile([0.0, 0.0, 1.0], (len(pos), 1))
    uv = np.stack([xx / w + 0.5, yy / h], -1).reshape(-1, 2)
    idx = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = (i + 1) * (n + 1) + j
            idx += [[a, b, a + 1], [b, b + 1, a + 1]]
    return pos, nrm, uv, np.asarray(idx, np.uint32)


def leaf_quads(n_quads, center, spread):
    """Criss-crossing foliage quads around a bush center."""
    pos, nrm, uv, idx = [], [], [], []
    for _ in range(n_quads):
        c = center + rng.normal(0, spread, 3) * [1, 0.6, 1]
        c[1] = abs(c[1]) + 0.2
        ang = rng.uniform(0, np.pi)
        s = rng.uniform(0.4, 0.9)
        t = np.array([np.cos(ang), 0, np.sin(ang)]) * s
        up = np.array([rng.normal(0, 0.2), 1.0, rng.normal(0, 0.2)])
        up = up / np.linalg.norm(up) * s
        n = np.cross(t, up)
        n /= np.linalg.norm(n)
        base = len(pos)
        pos += [c - t, c + t, c + t + up, c - t + up]
        nrm += [n] * 4
        uv += [[0, 1], [1, 1], [1, 0], [0, 0]]
        idx += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    return (np.asarray(pos, np.float64), np.asarray(nrm, np.float64),
            np.asarray(uv, np.float64), np.asarray(idx, np.uint32))


def translate(prim, t):
    pos, nrm, uv, idx = prim
    return pos + np.asarray(t, np.float64), nrm, uv, idx


def merge(prims):
    pos, nrm, uv, idx, off = [], [], [], [], 0
    for p, n, u, i in prims:
        pos.append(p)
        nrm.append(n)
        uv.append(u)
        idx.append(i + off)
        off += len(p)
    return (np.concatenate(pos), np.concatenate(nrm), np.concatenate(uv),
            np.concatenate(idx))


# ------------------------------------------------------------- textures
def stone_texture(res=256, base=(0.62, 0.58, 0.52)):
    """Noisy stone with mortar grid lines."""
    img = np.ones((res, res, 3), np.float32) * base
    noise = rng.normal(0, 0.05, (res // 8, res // 8, 1))
    noise = np.kron(noise, np.ones((8, 8, 1)))
    img = img + noise
    for k in range(0, res, 32):
        img[k:k + 2, :] *= 0.6
        img[:, k:k + 2] *= 0.6
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def fabric_texture(res=128):
    img = np.ones((res, res, 3), np.float32) * (0.45, 0.08, 0.08)
    stripes = (np.arange(res) // 16 % 2).astype(np.float32) * 0.12
    img[:, :, 0] += stripes[None, :]
    weave = rng.normal(0, 0.02, (res, res, 1))
    return (np.clip(img + weave, 0, 1) * 255).astype(np.uint8)


def leaf_texture(res=128):
    """RGBA leaf cluster: green blobs on a fully transparent background."""
    rgba = np.zeros((res, res, 4), np.float32)
    yy, xx = np.mgrid[0:res, 0:res] / res
    for _ in range(12):
        cx, cy = rng.uniform(0.15, 0.85, 2)
        rx, ry = rng.uniform(0.06, 0.16, 2)
        a = rng.uniform(0, np.pi)
        dx, dy = xx - cx, yy - cy
        rdx = dx * np.cos(a) + dy * np.sin(a)
        rdy = -dx * np.sin(a) + dy * np.cos(a)
        mask = (rdx / rx) ** 2 + (rdy / ry) ** 2 < 1.0
        g = rng.uniform(0.25, 0.5)
        rgba[mask] = [0.08, g, 0.05, 1.0]
    return (np.clip(rgba, 0, 1) * 255).astype(np.uint8)


# ------------------------------------------------------------- glb writer
class GLB:
    def __init__(self):
        self.bin = b""
        self.buffer_views = []
        self.accessors = []
        self.images = []
        self.textures = []
        self.materials = []
        self.meshes = []
        self.nodes = []
        self.cameras = []
        self.lights = []

    def blob(self, data: bytes, target=None) -> int:
        while len(self.bin) % 4:
            self.bin += b"\x00"
        bv = dict(buffer=0, byteOffset=len(self.bin), byteLength=len(data))
        if target:
            bv["target"] = target
        self.bin += data
        self.buffer_views.append(bv)
        return len(self.buffer_views) - 1

    def accessor(self, arr, ctype, atype, target):
        bv = self.blob(np.ascontiguousarray(arr).tobytes(), target)
        acc = dict(bufferView=bv, componentType=ctype,
                   count=len(arr), type=atype)
        if atype == "VEC3" and ctype == 5126:
            acc["min"] = [float(v) for v in arr.min(0)]
            acc["max"] = [float(v) for v in arr.max(0)]
        self.accessors.append(acc)
        return len(self.accessors) - 1

    def image_png(self, rgb8) -> int:
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            write_png(f.name, rgb8)
            data = open(f.name, "rb").read()
        bv = self.blob(data)
        self.images.append(dict(bufferView=bv, mimeType="image/png"))
        self.textures.append(dict(source=len(self.images) - 1))
        return len(self.textures) - 1

    def primitive(self, prim, material):
        pos, nrm, uv, idx = prim
        return dict(
            attributes=dict(
                POSITION=self.accessor(pos.astype(np.float32), 5126, "VEC3",
                                       34962),
                NORMAL=self.accessor(nrm.astype(np.float32), 5126, "VEC3",
                                     34962),
                TEXCOORD_0=self.accessor(uv.astype(np.float32), 5126, "VEC2",
                                         34962),
            ),
            indices=self.accessor(idx.reshape(-1).astype(np.uint32), 5125,
                                  "SCALAR", 34963),
            material=material, mode=4)

    def write(self, path, scene_json):
        js = json.dumps(scene_json).encode()
        while len(js) % 4:
            js += b" "
        while len(self.bin) % 4:
            self.bin += b"\x00"
        total = 12 + 8 + len(js) + 8 + len(self.bin)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
            f.write(struct.pack("<II", len(self.bin), 0x004E4942) + self.bin)


def main(out_path):
    g = GLB()
    tex_stone = g.image_png(stone_texture())
    tex_col = g.image_png(stone_texture(base=(0.7, 0.66, 0.6)))
    tex_fabric = g.image_png(fabric_texture())
    tex_leaf = g.image_png(leaf_texture())

    g.materials = [
        dict(name="stone", pbrMetallicRoughness=dict(
            baseColorTexture=dict(index=tex_stone), metallicFactor=0.0,
            roughnessFactor=0.9)),
        dict(name="column", pbrMetallicRoughness=dict(
            baseColorTexture=dict(index=tex_col), metallicFactor=0.0,
            roughnessFactor=0.8)),
        dict(name="fabric", pbrMetallicRoughness=dict(
            baseColorTexture=dict(index=tex_fabric), metallicFactor=0.0,
            roughnessFactor=1.0)),
        dict(name="leaf", alphaMode="MASK", alphaCutoff=0.5, doubleSided=True,
             pbrMetallicRoughness=dict(
                 baseColorTexture=dict(index=tex_leaf), metallicFactor=0.0,
                 roughnessFactor=1.0)),
    ]

    AX, AZ, H = 36.0, 16.0, 12.0  # atrium extents / wall height
    stone, column, fabric, leaf = [], [], [], []

    # floor (dense grid so the stone texture tiles across real geometry)
    stone.append(translate(grid_quad(96, 48, AX, AZ, uv_tiles=12.0),
                           (0, 0, 0)))
    # side walls (rotated grids)
    for zs in (-AZ / 2, AZ / 2):
        p, n, u, i = grid_quad(96, 32, AX, H, uv_tiles=8.0)
        p = p[:, [0, 2, 1]] * [1, 1, 1] + [0, H / 2, zs]
        p[:, 1] += H / 2 - H / 2
        nn = np.tile([0.0, 0.0, -np.sign(zs)], (len(p), 1))
        stone.append((p, nn, u, i))
    for xs in (-AX / 2, AX / 2):
        p, n, u, i = grid_quad(32, 48, H, AZ, uv_tiles=6.0)
        p = p[:, [1, 0, 2]] + [xs, H / 2, 0]
        nn = np.tile([-np.sign(xs), 0.0, 0.0], (len(p), 1))
        stone.append((p, nn, u, i))
    # upper ledges (second-storey walkway slabs)
    for zs in (-AZ / 2 + 2.0, AZ / 2 - 2.0):
        stone.append(translate(grid_quad(48, 8, AX, 3.0, uv_tiles=6.0),
                               (0, 6.0, zs + (0.5 if zs < 0 else -0.5))))

    # colonnade: two rows x 9 columns x 2 storeys + bases/capitals + arches
    col_geo = fluted_column(0.45, 4.6)
    col_xs = np.linspace(-AX / 2 + 3, AX / 2 - 3, 9)
    for storey, y0 in ((0, 0.0), (1, 6.2)):
        for zrow in (-AZ / 2 + 3.2, AZ / 2 - 3.2):
            for x in col_xs:
                column.append(translate(col_geo, (x, y0 + 0.5, zrow)))
                column.append(translate(box(1.2, 0.5, 1.2, 1.0),
                                        (x, y0, zrow)))
                column.append(translate(box(1.1, 0.45, 1.1, 1.0),
                                        (x, y0 + 5.1, zrow)))
            # arches between adjacent columns
            gapr = (col_xs[1] - col_xs[0]) / 2
            for xa in (col_xs[:-1] + col_xs[1:]) / 2:
                a = arch(gapr * 0.92, 0.9, n_seg=20, n_w=3)
                column.append(translate(a, (xa, y0 + 5.2, zrow)))

    # curtains hanging from the upper arches
    for k, x in enumerate(col_xs[1:-1:2]):
        fabric.append(translate(wavy_curtain(2.6, 4.5, n=22),
                                (x, 6.4, -AZ / 2 + 3.6)))
        fabric.append(translate(wavy_curtain(2.6, 4.5, n=22),
                                (x + 2.0, 6.4, AZ / 2 - 3.6)))

    # foliage bushes along the atrium center
    for x in np.linspace(-AX / 2 + 5, AX / 2 - 5, 6):
        leaf.append(leaf_quads(110, np.array([x, 0.0, 0.0]), 1.1))

    prims = [g.primitive(merge(stone), 0), g.primitive(merge(column), 1),
             g.primitive(merge(fabric), 2), g.primitive(merge(leaf), 3)]
    n_tris = sum(len(p[3]) for p in
                 (merge(stone), merge(column), merge(fabric), merge(leaf)))
    g.meshes = [dict(primitives=prims)]

    g.cameras = [dict(type="perspective", perspective=dict(
        yfov=0.82, znear=0.1, zfar=300.0, aspectRatio=16 / 9))]
    g.lights = [
        dict(type="directional", intensity=3.2, color=[1.0, 0.96, 0.9]),
        dict(type="point", intensity=260.0, color=[1.0, 0.9, 0.75]),
        dict(type="point", intensity=200.0, color=[0.8, 0.85, 1.0]),
    ]

    def look_at_matrix(eye, target, up=(0, 1, 0)):
        eye = np.asarray(eye, np.float64)
        f = np.asarray(target, np.float64) - eye
        f /= np.linalg.norm(f)
        s = np.cross(f, up)
        s /= np.linalg.norm(s)
        u = np.cross(s, f)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = s, u, -f, eye
        return [float(v) for v in m.T.reshape(-1)]  # glTF column-major

    sun_dir = np.array([-0.35, -1.0, 0.25])
    sun_dir /= np.linalg.norm(sun_dir)
    z = np.array([0.0, 0.0, -1.0])  # KHR: light shines down local -z
    axis = np.cross(z, sun_dir)
    c = float(z @ sun_dir)
    k = axis / max(np.linalg.norm(axis), 1e-9)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(np.arccos(c)) * K + (1 - c) * (K @ K)
    sun_m = np.eye(4)
    sun_m[:3, :3] = R
    sun_m[:3, 3] = [0, 25, 0]

    g.nodes = [
        dict(mesh=0),
        dict(camera=0, matrix=look_at_matrix(
            [-AX / 2 + 1.5, 5.2, 0.0], [AX / 2, 3.4, 0.0])),
        dict(extensions=dict(KHR_lights_punctual=dict(light=0)),
             matrix=[float(v) for v in sun_m.T.reshape(-1)]),
        dict(extensions=dict(KHR_lights_punctual=dict(light=1)),
             translation=[-6.0, 7.5, 0.0]),
        dict(extensions=dict(KHR_lights_punctual=dict(light=2)),
             translation=[8.0, 7.5, 0.0]),
    ]

    scene_json = dict(
        asset=dict(version="2.0", generator="pathtracer_tpu make_sponza"),
        scene=0,
        scenes=[dict(nodes=list(range(len(g.nodes))))],
        nodes=g.nodes,
        meshes=g.meshes,
        cameras=g.cameras,
        materials=g.materials,
        textures=g.textures,
        images=g.images,
        samplers=[],
        accessors=g.accessors,
        bufferViews=g.buffer_views,
        buffers=[dict(byteLength=len(g.bin))],
        extensionsUsed=["KHR_lights_punctual"],
        extensions=dict(KHR_lights_punctual=dict(lights=g.lights)),
    )
    g.write(out_path, scene_json)
    print(f"wrote {out_path}: {n_tris} triangles, "
          f"{os.path.getsize(out_path) / 1e6:.1f} MB")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "sponza_proc.glb")
    main(out)
