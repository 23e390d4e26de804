"""Generate data/classroom_proc.glb — the second flagship scene.

The reference README *leads* with a 4096-spp classroom render
(/root/reference/README.md:3); this is its procedural analogue: a
daylight classroom — plank floor, plaster walls, a window wall with
three openings the sun shines through, a framed blackboard, rows of
wooden desks + chairs with turned legs, and emissive ceiling panels
(imported as area lights by scene/gltf.py's emissive path) — written
as a standalone GLB exercising the same import pipeline as Sponza.

Usage: python tools/make_classroom.py [out.glb]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_sponza import (GLB, box, fluted_column, grid_quad, merge,  # noqa
                         translate)

rng = np.random.default_rng(23)


# ------------------------------------------------------------- textures
def wood_texture(res=256, base=(0.45, 0.30, 0.18), streak=12.0):
    """Plank-ish wood: horizontal value streaks + per-plank tone."""
    y, x = np.mgrid[0:res, 0:res] / res
    planks = np.floor(y * 8.0)
    tone = rng.normal(0.0, 0.05, int(planks.max()) + 1)[planks.astype(int)]
    grain = 0.06 * np.sin(x * streak * 2 * np.pi
                          + 3.0 * np.sin(y * 40.0 + planks))
    noise = rng.normal(0.0, 0.02, (res, res))
    img = np.stack([np.clip(b * (1.0 + tone + grain + noise), 0, 1)
                    for b in base], -1)
    return (img * 255).astype(np.uint8)


def plaster_texture(res=256, base=(0.74, 0.72, 0.66)):
    v = rng.normal(0.0, 0.025, (res, res))
    # large-scale mottling via a separable blur of coarse noise
    c = rng.normal(0.0, 0.06, (res // 16, res // 16))
    c = np.kron(c, np.ones((16, 16)))
    img = np.stack([np.clip(b * (1.0 + v + c), 0, 1) for b in base], -1)
    return (img * 255).astype(np.uint8)


def board_texture(res=128):
    """Dark slate with faint chalk smudges."""
    v = rng.normal(0.0, 0.015, (res, res))
    smudge = np.clip(rng.normal(0.0, 0.05, (res // 8, res // 8)), 0, None)
    smudge = np.kron(smudge, np.ones((8, 8)))
    img = np.stack([np.clip(0.08 + v + 0.25 * smudge, 0, 1)] * 3, -1)
    img[..., 1] *= 1.15  # green slate
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


# ------------------------------------------------------------- furniture
def desk(top_w=1.15, top_d=0.6, top_y=0.73):
    parts = [translate(box(top_w, 0.045, top_d, 1.0), (0, top_y, 0))]
    leg = fluted_column(0.026, top_y, n_seg=10, n_ring=4, flutes=6)
    for sx in (-1, 1):
        for sz in (-1, 1):
            parts.append(translate(
                leg, (sx * (top_w / 2 - 0.06), 0, sz * (top_d / 2 - 0.06))))
    return merge(parts)


def chair(seat_w=0.42, seat_y=0.45):
    parts = [translate(box(seat_w, 0.04, seat_w, 0.5), (0, seat_y, 0)),
             translate(box(seat_w, 0.5, 0.04, 0.5),
                       (0, seat_y + 0.04, seat_w / 2 - 0.02))]
    leg = fluted_column(0.02, seat_y, n_seg=8, n_ring=3, flutes=5)
    for sx in (-1, 1):
        for sz in (-1, 1):
            parts.append(translate(
                leg, (sx * (seat_w / 2 - 0.04), 0, sz * (seat_w / 2 - 0.04))))
    return merge(parts)


def main(out_path):
    g = GLB()
    tex_floor = g.image_png(wood_texture(base=(0.52, 0.36, 0.22)))
    tex_wood = g.image_png(wood_texture(base=(0.42, 0.27, 0.15), streak=20.0))
    tex_wall = g.image_png(plaster_texture())
    tex_board = g.image_png(board_texture())

    g.materials = [
        dict(name="floor", pbrMetallicRoughness=dict(
            baseColorTexture=dict(index=tex_floor), metallicFactor=0.0,
            roughnessFactor=0.55)),
        dict(name="wood", pbrMetallicRoughness=dict(
            baseColorTexture=dict(index=tex_wood), metallicFactor=0.0,
            roughnessFactor=0.65)),
        dict(name="wall", pbrMetallicRoughness=dict(
            baseColorTexture=dict(index=tex_wall), metallicFactor=0.0,
            roughnessFactor=0.95)),
        dict(name="board", pbrMetallicRoughness=dict(
            baseColorTexture=dict(index=tex_board), metallicFactor=0.0,
            roughnessFactor=0.25)),
        dict(name="panel", emissiveFactor=[1.6, 1.6, 1.6],
             pbrMetallicRoughness=dict(
                 baseColorFactor=[1, 1, 1, 1], metallicFactor=0.0,
                 roughnessFactor=1.0)),
    ]

    RX, RZ, RH = 10.0, 7.0, 3.2  # room extents / height
    floor, wood, wall, board, panel = [], [], [], [], []

    floor.append(translate(grid_quad(64, 48, RX, RZ, uv_tiles=5.0),
                           (0, 0, 0)))
    # ceiling (grid quad flipped to face down)
    p, n, u, i = grid_quad(48, 32, RX, RZ, uv_tiles=6.0)
    wall.append((p + [0, RH, 0], -n, u, i[:, ::-1].copy()))

    def vwall(nx, ny, sx, sy, tiles):
        """Vertical wall strip in the xy-plane facing +z, origin-centered."""
        p, n, u, i = grid_quad(nx, ny, sx, sy, uv_tiles=tiles)
        return p[:, [0, 2, 1]], np.tile([0.0, 0.0, 1.0], (len(p), 1)), u, i

    # back wall (-z, faces +z into the room) with the blackboard
    p, n, u, i = vwall(48, 24, RX, RH, 4.0)
    wall.append((p + [0, RH / 2, -RZ / 2], n, u, i))
    # front wall (+z side... the WINDOW wall is +x); solid +z wall:
    p, n, u, i = vwall(48, 24, RX, RH, 4.0)
    wall.append((p * [1, 1, -1] + [0, RH / 2, RZ / 2], -n, u, i))
    # solid -x wall
    p, n, u, i = vwall(32, 24, RZ, RH, 3.0)
    q = p[:, [2, 1, 0]]  # rotate strip into the zy plane
    wall.append((q + [-RX / 2, RH / 2, 0], np.tile([1.0, 0, 0], (len(q), 1)),
                 u, i))
    # window wall (+x): sill strip, lintel strip, piers between 3 openings
    sill_h, lin_y = 0.9, 2.4
    wall.append(translate(box(0.25, sill_h, RZ, 2.0), (RX / 2, 0, 0)))
    wall.append(translate(box(0.25, RH - lin_y, RZ, 2.0), (RX / 2, lin_y, 0)))
    win_w = 1.5
    pier_zs = np.linspace(-RZ / 2, RZ / 2, 4)  # 3 bays
    for k, zc in enumerate(pier_zs):
        w = 0.45 if k in (0, 3) else 0.55
        wall.append(translate(box(0.25, lin_y - sill_h, w, 1.0),
                              (RX / 2, sill_h, zc)))
    # window frames (wood) around each opening
    for zc in (pier_zs[:-1] + pier_zs[1:]) / 2:
        for dy, h in ((sill_h, 0.06), (lin_y - 0.06, 0.06)):
            wood.append(translate(box(0.3, h, win_w, 1.0),
                                  (RX / 2, dy, zc)))
        wood.append(translate(box(0.3, lin_y - sill_h, 0.06, 1.0),
                              (RX / 2, sill_h, zc)))  # center mullion

    # blackboard: frame + slate on the back wall
    wood.append(translate(box(3.6, 0.08, 0.1, 2.0), (0, 1.0, -RZ / 2 + 0.06)))
    wood.append(translate(box(3.6, 0.08, 0.1, 2.0), (0, 2.3, -RZ / 2 + 0.06)))
    p, n, u, i = vwall(12, 8, 3.4, 1.25, 1.0)
    board.append((p + [0, 1.7, -RZ / 2 + 0.1], n, u, i))

    # desks + chairs: 4 rows x 3 columns facing the blackboard (-z)
    for xr in np.linspace(-RX / 2 + 2.2, RX / 2 - 2.4, 3):
        for zr in np.linspace(-RZ / 2 + 2.0, RZ / 2 - 1.2, 4):
            jx, jz = rng.normal(0, 0.04, 2)
            wood.append(translate(desk(), (xr + jx, 0, zr + jz)))
            wood.append(translate(chair(), (xr + jx, 0, zr + jz + 0.55)))
    # teacher's desk by the blackboard
    wood.append(translate(desk(1.6, 0.8, 0.78), (1.8, 0, -RZ / 2 + 1.1)))

    # emissive ceiling panels -> area lights (gltf.py emissive x10 path)
    for xc in np.linspace(-RX / 4, RX / 4, 2):
        for zc in np.linspace(-RZ / 4, RZ / 4, 2):
            p, n, u, i = grid_quad(2, 2, 1.4, 0.7, uv_tiles=1.0)
            panel.append((p + [xc, RH - 0.02, zc], -n, u, i[:, ::-1].copy()))

    prims = [g.primitive(merge(floor), 0), g.primitive(merge(wood), 1),
             g.primitive(merge(wall), 2), g.primitive(merge(board), 3),
             g.primitive(merge(panel), 4)]
    n_tris = sum(len(merge(x)[3]) for x in (floor, wood, wall, board, panel))
    g.meshes = [dict(primitives=prims)]

    g.cameras = [dict(type="perspective", perspective=dict(
        yfov=0.88, znear=0.05, zfar=100.0, aspectRatio=16 / 9))]
    g.lights = [
        # afternoon sun angled through the +x windows
        dict(type="directional", intensity=4.5, color=[1.0, 0.95, 0.85]),
        dict(type="point", intensity=60.0, color=[0.9, 0.93, 1.0]),
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
        return [float(v) for v in m.T.reshape(-1)]

    sun_dir = np.array([-0.75, -0.55, -0.25])
    sun_dir /= np.linalg.norm(sun_dir)
    z = np.array([0.0, 0.0, -1.0])
    axis = np.cross(z, sun_dir)
    c = float(z @ sun_dir)
    k = axis / max(np.linalg.norm(axis), 1e-9)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(np.arccos(c)) * K + (1 - c) * (K @ K)
    sun_m = np.eye(4)
    sun_m[:3, :3] = R
    sun_m[:3, 3] = [0, 20, 0]

    g.nodes = [
        dict(mesh=0),
        dict(camera=0, matrix=look_at_matrix(
            [-RX / 2 + 0.9, 1.75, RZ / 2 - 1.0], [2.2, 1.0, -RZ / 2 + 1.0])),
        dict(extensions=dict(KHR_lights_punctual=dict(light=0)),
             matrix=[float(v) for v in sun_m.T.reshape(-1)]),
        dict(extensions=dict(KHR_lights_punctual=dict(light=1)),
             translation=[0.0, 2.9, 0.0]),
    ]

    import json as _json  # scene json assembled like make_sponza.py
    scene_json = dict(
        asset=dict(version="2.0",
                   generator="pathtracer_tpu make_classroom"),
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
    del _json
    g.write(out_path, scene_json)
    print(f"wrote {out_path}: {n_tris} triangles, "
          f"{os.path.getsize(out_path) / 1e6:.1f} MB")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "classroom_proc.glb")
    main(out)
