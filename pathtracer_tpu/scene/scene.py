"""Packed scene representation: SoA device arrays + host build.

TPU-native replacement for the reference's pointer-based scene graph
(``RenderScene`` pathtracer/mod.rs:84-107, ``GeometricPrimitive``
primitive.rs:8-51, per-triangle ``Arc<Triangle>`` shape.rs:626-641):
triangles become a flat SoA soup; materials become an integer-typed table the
shading stage selects from with masks; lights become a table indexed by a
categorical draw. Everything is a pytree of jnp arrays, replicated per chip.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# material type codes (ref material/mod.rs:28-36 enum, static table here)
MAT_MATTE = 0
MAT_MIRROR = 1
MAT_GLASS = 2
MAT_METAL = 3
MAT_SUBSTRATE = 4
MAT_DISNEY = 5
# GLOSSY reflection+transmission dielectric (MicrofacetReflection +
# MicrofacetTransmission, bxdf/microfacet.rs:176-384). No reference
# MATERIAL constructs the transmission lobe (Glass is specular-only with a
# TODO for roughness, material/mod.rs:216-256); this type completes the
# lobe library and backs the Mitsuba `roughdielectric` BSDF.
MAT_ROUGHGLASS = 6

# light type codes (ref light.rs Point/Directional/DiffuseArea/InfiniteArea)
LIGHT_AREA = 0
LIGHT_POINT = 1
LIGHT_DISTANT = 2
LIGHT_INFINITE = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneData:
    """Device-side scene. All leaves are jnp arrays (replicated per chip)."""

    # triangle soup (F, ...)
    p0: Any
    p1: Any
    p2: Any
    n0: Any
    n1: Any
    n2: Any
    has_normals: Any  # (F,) bool — whether shading normals are valid
    uv0: Any
    uv1: Any
    uv2: Any
    material_id: Any  # (F,) i32
    area_light_id: Any  # (F,) i32, -1 if not emissive
    tri_ng: Any  # (F,3) per-tri geometric normal, pre-face-forwarded
    tri_alpha_txd: Any  # (F,) i32 alpha-mask texture descriptor, -1 = none

    # material table (M, ...)
    mat_type: Any  # (M,) i32
    mat_kd: Any  # (M,3) matte kd / glass kr / substrate rd / disney color
    mat_ks: Any  # (M,3) glass kt / substrate rs / metal specular reflectance
    mat_eta: Any  # (M,3) metal eta rgb; [:,0] = glass/disney ior
    mat_k: Any  # (M,3) metal absorption k
    mat_rough: Any  # (M,2) alpha_x/alpha_y (pre-remap values)
    mat_misc: Any  # (M,4) disney: metallic, roughness, spec_tint, _
    mat_remap: Any  # (M,) bool — run roughness_to_alpha remap

    # light table (L, ...)
    light_type: Any  # (L,) i32
    light_emit: Any  # (L,3) radiance (area/infinite scale) or intensity
    light_tri: Any  # (L,) i32 triangle id for area lights
    light_vec: Any  # (L,3) point light position / distant light direction

    # texture descriptors (K, ...): kind 0=const 1=checker 2=image
    txd_kind: Any
    txd_rgb0: Any  # (K,3) const value / checker color0
    txd_rgb1: Any  # (K,3) checker color1
    txd_scale: Any  # (K,3) multiplier (image textures)
    txd_uv: Any  # (K,4) uscale,vscale,uoffset,voffset
    txd_image: Any  # (K,) i32 texture-pool id
    txd_channel: Any  # (K,) i32 -1=rgb, 0..2 scalar channel broadcast
    txd_srgb: Any  # (K,) bool - sRGB decode image texels
    tex: Any  # TexturePool

    # per-material texture bindings (-1 = use the constant table value)
    mat_kd_tx: Any  # (M,)
    mat_ks_tx: Any  # (M,)
    mat_metallic_tx: Any  # (M,)
    mat_rough_tx: Any  # (M,)
    mat_normal_tx: Any  # (M,) tangent-space normal map (NormalMaterial)

    # environment light (single; zeros if absent)
    env_map: Any  # (He, We, 3) equirect radiance (1x1 black if none)
    env_cond_func: Any  # (Hd, Wd) 2D distribution tables (1x1 if none)
    env_cond_cdf: Any  # (Hd, Wd+1)
    env_cond_int: Any  # (Hd,)
    env_marg_func: Any  # (Hd,)
    env_marg_cdf: Any  # (Hd+1,)
    env_marg_int: Any  # ()
    env_to_world: Any  # (3,3) light-to-world rotation/linear part
    world_to_env: Any  # (3,3)

    # scalars
    world_center: Any  # (3,)
    world_radius: Any  # ()
    n_lights: Any  # () i32 — number of entries in the light table
    has_env: Any  # () bool


def _as_f32(x):
    # HOST numpy: SceneData stays host-side through the whole build;
    # TracedScene.create pushes every leaf to the device ONCE at the end
    # (per-field device pulls/pushes each cost an axon-tunnel roundtrip —
    # measured ~100 s of a 123.6k-tri TracedScene.create on TPU)
    return np.asarray(x, np.float32)


# ---------------------------------------------------------------------------
# Packed per-row attribute matrices. Per-lane gathers on TPU cost ~1 element
# per cycle, so the hot path fetches ONE packed row per index (one-hot MXU
# matmul for small tables, single row gather otherwise — ops/gather.py)
# instead of a dozen separate array gathers. Integer ids ride as exact f32.

# tri_attr columns (F, 42)
TA_P0 = slice(0, 3)
TA_P1 = slice(3, 6)
TA_P2 = slice(6, 9)
TA_N0 = slice(9, 12)
TA_N1 = slice(12, 15)
TA_N2 = slice(15, 18)
TA_UV0 = slice(18, 20)
TA_UV1 = slice(20, 22)
TA_UV2 = slice(22, 24)
TA_NG0 = slice(24, 27)   # unflipped unit geometric normal cross(p0-p2, p1-p2)
TA_NGF = slice(27, 30)   # face-forwarded tri_ng (emission lookups)
TA_DPDU = slice(30, 33)  # per-tri dpdu with degenerate fallback applied
TA_DPDV = slice(33, 36)
TA_KE = slice(36, 39)    # per-tri emission (area lights; zeros otherwise)
TA_MAT = 39
TA_LID = 40
TA_HASN = 41
TA_ALPHA = 42            # alpha-mask texture descriptor id (-1 = none)
TA_WIDTH = 43

# light_attr columns (L, 26)
LA_TYPE = 0
LA_EMIT = slice(1, 4)
LA_VEC = slice(4, 7)
LA_P0 = slice(7, 10)
LA_P1 = slice(10, 13)
LA_P2 = slice(13, 16)
LA_N0 = slice(16, 19)
LA_N1 = slice(19, 22)
LA_N2 = slice(22, 25)
LA_HASN = 25
LA_WIDTH = 26

# mat_attr columns (M, 20)
MA_TYPE = 0
MA_KD = slice(1, 4)
MA_KS = slice(4, 7)
MA_ETA = slice(7, 10)
MA_K = slice(10, 13)
MA_ROUGH = slice(13, 15)
MA_MISC = slice(15, 19)
MA_REMAP = 19
MA_WIDTH = 20

# alpha_pack columns (F, 16) — inline alpha-mask test inside the BVH leaf
# loop (shape.rs:228-244,471-521 test the mask during traversal; the
# wavefront analogue evaluates it per leaf candidate so ONE traversal
# replaces the re-spawn retry loop). The pool base offset rides as an i32
# BIT PATTERN (bitcast, not a float cast) so pools >2^24 texels stay exact.
AP_UV0 = slice(0, 2)
AP_UV1 = slice(2, 4)
AP_UV2 = slice(4, 6)
AP_SUSV = slice(6, 8)    # UVMap scale (su, sv)
AP_OUOV = slice(8, 10)   # UVMap offset (ou, ov)
AP_BASE = 10             # level-0 pool offset (i32 bits)
AP_W = 11                # level-0 width (exact f32)
AP_H = 12                # level-0 height
AP_WRAP = 13             # wrap mode
AP_FLAG = 14             # 1.0 if this triangle carries an alpha mask
AP_WIDTH = 16


def pack_alpha_tri(sd: "SceneData"):
    """(F, 16) inline-alpha rows + (total,) level-0 alpha texel column.

    Returns (None, None) when no triangle carries a mask. Mask textures are
    plain image descriptors (scale 1, no srgb, alpha replicated to rgb by
    the importer), so the test reduces to a level-0 bilinear of pool
    column 0 at the UV-mapped st — exactly eval_texture's width-0 path.
    """
    alpha = np.asarray(sd.tri_alpha_txd)
    if not (alpha >= 0).any():
        return None, None
    txd = np.maximum(alpha, 0)
    uvm = np.asarray(sd.txd_uv, np.float32)[txd]  # (F,4) su sv ou ov
    tex = np.asarray(sd.txd_image)[txd]
    pool = sd.tex
    base = np.asarray(pool.level_offset)[tex, 0].astype(np.int32)
    w0 = np.asarray(pool.level_w)[tex, 0].astype(np.float32)
    h0 = np.asarray(pool.level_h)[tex, 0].astype(np.float32)
    wrap = np.asarray(pool.wrap)[tex].astype(np.float32)
    f = alpha.shape[0]
    rows = np.zeros((f, AP_WIDTH), np.float32)
    rows[:, AP_UV0] = np.asarray(sd.uv0, np.float32)
    rows[:, AP_UV1] = np.asarray(sd.uv1, np.float32)
    rows[:, AP_UV2] = np.asarray(sd.uv2, np.float32)
    rows[:, AP_SUSV] = uvm[:, 0:2]
    rows[:, AP_OUOV] = uvm[:, 2:4]
    rows[:, AP_BASE] = base.view(np.float32)
    rows[:, AP_W] = w0
    rows[:, AP_H] = h0
    rows[:, AP_WRAP] = wrap
    rows[:, AP_FLAG] = (alpha >= 0).astype(np.float32)
    texels = np.asarray(np.asarray(pool.data)[:, 0])
    return np.asarray(rows), texels


def pack_tri_attr(sd: "SceneData") -> np.ndarray:
    """(F, 42) packed per-triangle shading attributes (host, build-time).

    Precomputes the per-triangle constants of the interaction build
    (ref shape.rs:187-215): dpdu/dpdv from the UV parameterization with
    the degenerate fallback frame, the unit geometric normal, and the
    per-triangle emission (light_emit row of the tri's area light).
    """
    p0 = np.asarray(sd.p0, np.float32)
    p1 = np.asarray(sd.p1, np.float32)
    p2 = np.asarray(sd.p2, np.float32)
    uv0 = np.asarray(sd.uv0, np.float32)
    uv1 = np.asarray(sd.uv1, np.float32)
    uv2 = np.asarray(sd.uv2, np.float32)
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = p0 - p2
    dp12 = p1 - p2
    det = duv02[:, 0] * duv12[:, 1] - duv02[:, 1] * duv12[:, 0]
    degenerate = np.abs(det) < 1e-8
    inv_det = 1.0 / np.where(degenerate, 1.0, det)
    dpdu = ((duv12[:, 1:2] * dp02 - duv02[:, 1:2] * dp12)
            * inv_det[:, None]).astype(np.float32)
    dpdv = ((-duv12[:, 0:1] * dp02 + duv02[:, 0:1] * dp12)
            * inv_det[:, None]).astype(np.float32)
    ng_raw = np.cross(dp02, dp12).astype(np.float32)
    ng0 = (ng_raw / np.sqrt(np.maximum(
        (ng_raw * ng_raw).sum(-1, keepdims=True), 1e-30))).astype(np.float32)
    bad = degenerate | ((np.cross(dpdu, dpdv) ** 2).sum(-1) == 0.0)
    # coordinate_system fallback (ref math.rs:48-61 semantics, f32)
    cx = np.where(np.abs(ng0[:, 0]) > np.abs(ng0[:, 1]),
                  1.0 / np.sqrt(np.maximum(ng0[:, 0] ** 2 + ng0[:, 2] ** 2,
                                           1e-30)), 0.0).astype(np.float32)
    cy = np.where(np.abs(ng0[:, 0]) > np.abs(ng0[:, 1]), 0.0,
                  1.0 / np.sqrt(np.maximum(ng0[:, 1] ** 2 + ng0[:, 2] ** 2,
                                           1e-30))).astype(np.float32)
    fb_u = np.where((np.abs(ng0[:, 0]) > np.abs(ng0[:, 1]))[:, None],
                    np.stack([-ng0[:, 2] * cx, np.zeros_like(cx),
                              ng0[:, 0] * cx], -1),
                    np.stack([np.zeros_like(cy), ng0[:, 2] * cy,
                              -ng0[:, 1] * cy], -1)).astype(np.float32)
    fb_v = np.cross(ng0, fb_u).astype(np.float32)
    dpdu = np.where(bad[:, None], fb_u, dpdu)
    dpdv = np.where(bad[:, None], fb_v, dpdv)

    lid = np.asarray(sd.area_light_id, np.int32)
    emit = np.asarray(sd.light_emit, np.float32)
    ke = np.where((lid >= 0)[:, None], emit[np.maximum(lid, 0)], 0.0)

    cols = np.concatenate([
        p0, p1, p2,
        np.asarray(sd.n0, np.float32), np.asarray(sd.n1, np.float32),
        np.asarray(sd.n2, np.float32),
        uv0, uv1, uv2,
        ng0, np.asarray(sd.tri_ng, np.float32), dpdu, dpdv, ke,
        np.asarray(sd.material_id, np.float32)[:, None],
        lid.astype(np.float32)[:, None],
        np.asarray(sd.has_normals, np.float32)[:, None],
        np.asarray(sd.tri_alpha_txd, np.float32)[:, None],
    ], axis=1).astype(np.float32)
    assert cols.shape[1] == TA_WIDTH
    return np.asarray(cols)


def pack_light_attr(sd: "SceneData") -> np.ndarray:
    """(L, 26) packed light table incl. the area light's triangle data."""
    ltri = np.maximum(np.asarray(sd.light_tri, np.int32), 0)
    cols = np.concatenate([
        np.asarray(sd.light_type, np.float32)[:, None],
        np.asarray(sd.light_emit, np.float32),
        np.asarray(sd.light_vec, np.float32),
        np.asarray(sd.p0, np.float32)[ltri],
        np.asarray(sd.p1, np.float32)[ltri],
        np.asarray(sd.p2, np.float32)[ltri],
        np.asarray(sd.n0, np.float32)[ltri],
        np.asarray(sd.n1, np.float32)[ltri],
        np.asarray(sd.n2, np.float32)[ltri],
        np.asarray(sd.has_normals, np.float32)[ltri][:, None],
    ], axis=1).astype(np.float32)
    assert cols.shape[1] == LA_WIDTH
    return np.asarray(cols)


def pack_mat_attr(sd: "SceneData") -> np.ndarray:
    """(M, 20) packed material constant table."""
    cols = np.concatenate([
        np.asarray(sd.mat_type, np.float32)[:, None],
        np.asarray(sd.mat_kd, np.float32),
        np.asarray(sd.mat_ks, np.float32),
        np.asarray(sd.mat_eta, np.float32),
        np.asarray(sd.mat_k, np.float32),
        np.asarray(sd.mat_rough, np.float32),
        np.asarray(sd.mat_misc, np.float32),
        np.asarray(sd.mat_remap, np.float32)[:, None],
    ], axis=1).astype(np.float32)
    assert cols.shape[1] == MA_WIDTH
    return np.asarray(cols)


def reorder_triangles(scene: "SceneData", order: np.ndarray) -> "SceneData":
    """Permute the triangle soup (e.g. into BVH leaf order).

    ``order[k]`` is the old index of the triangle now at slot k. Area-light
    triangle references are remapped through the inverse permutation.
    """
    # Host-side numpy throughout: jnp gathers here each trigger a compile
    # (25 compiles, the bulk of a 123.6k-tri TracedScene.create).
    order = np.asarray(order)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    lt = np.asarray(scene.light_tri)
    light_tri = np.where(lt >= 0, inv[np.maximum(lt, 0)],
                         lt).astype(np.int32)

    def take(a):
        return np.asarray(a)[order]

    return dataclasses.replace(
        scene,
        p0=take(scene.p0), p1=take(scene.p1), p2=take(scene.p2),
        n0=take(scene.n0), n1=take(scene.n1), n2=take(scene.n2),
        has_normals=take(scene.has_normals),
        uv0=take(scene.uv0), uv1=take(scene.uv1), uv2=take(scene.uv2),
        material_id=take(scene.material_id),
        area_light_id=take(scene.area_light_id),
        tri_ng=take(scene.tri_ng),
        tri_alpha_txd=take(scene.tri_alpha_txd),
        light_tri=light_tri,
    )


class SceneBuilder:
    """Host-side accumulation of meshes/materials/lights → SceneData."""

    def __init__(self) -> None:
        from .texture import TexturePoolBuilder
        self.tex_pool = TexturePoolBuilder()
        self.txds: list[dict] = []
        self.tri_p: list[np.ndarray] = []  # (f,3,3) per mesh
        self.tri_n: list[np.ndarray] = []
        self.tri_has_n: list[np.ndarray] = []
        self.tri_uv: list[np.ndarray] = []
        self.tri_mat: list[np.ndarray] = []
        self.tri_light: list[np.ndarray] = []
        self.tri_alpha: list[np.ndarray] = []
        self.materials: list[dict] = []
        self.lights: list[dict] = []
        self.env: dict | None = None

    def add_material(self, **kwargs) -> int:
        defaults = dict(
            mtype=MAT_MATTE, kd=(0.5, 0.5, 0.5), ks=(0.0, 0.0, 0.0),
            eta=(1.5, 1.5, 1.5), k=(0.0, 0.0, 0.0), rough=(0.0, 0.0),
            misc=(0.0, 0.0, 0.0, 0.0), remap=False,
            kd_tx=-1, ks_tx=-1, metallic_tx=-1, rough_tx=-1, normal_tx=-1,
        )
        defaults.update(kwargs)
        self.materials.append(defaults)
        return len(self.materials) - 1

    def add_texture_checker(self, color0, color1, uv=(1, 1, 0, 0)) -> int:
        """Checker texture descriptor (ref texture.rs CheckerTexture)."""
        self.txds.append(dict(kind=1, rgb0=color0, rgb1=color1,
                              scale=(1, 1, 1), uv=uv, image=0, channel=-1,
                              srgb=False))
        return len(self.txds) - 1

    def add_texture_image(self, image: np.ndarray, scale=(1, 1, 1),
                          uv=(1, 1, 0, 0), wrap: int = 0, channel: int = -1,
                          srgb: bool = False) -> int:
        """Image texture descriptor backed by the mip-pyramid pool
        (ref texture.rs ImageTexture/MIPMap)."""
        tex_id = self.tex_pool.add(image, wrap)
        self.txds.append(dict(kind=2, rgb0=(0, 0, 0), rgb1=(0, 0, 0),
                              scale=scale, uv=uv, image=tex_id,
                              channel=channel, srgb=srgb))
        return len(self.txds) - 1

    def add_mesh(self, positions: np.ndarray, indices: np.ndarray,
                 normals: np.ndarray | None, uvs: np.ndarray | None,
                 material_id: int, emission: np.ndarray | None = None,
                 alpha_txd: int = -1) -> None:
        """Add a world-space triangle mesh.

        positions (V,3), indices (F,3) int, normals (V,3) or None,
        uvs (V,2) or None. If emission is set, one DiffuseAreaLight is
        created per triangle (ref importer/mitsuba.rs:309-330). alpha_txd:
        texture-descriptor id of a per-mesh alpha cutout mask — hits where
        it evaluates to exactly 0 are discarded (ref shape.rs:228-244).
        """
        positions = np.asarray(positions, np.float32)
        indices = np.asarray(indices, np.int64)
        f = indices.shape[0]
        p = positions[indices]  # (F,3,3)
        self.tri_p.append(p)
        if normals is not None and len(normals):
            self.tri_n.append(np.asarray(normals, np.float32)[indices])
            self.tri_has_n.append(np.ones(f, bool))
        else:
            self.tri_n.append(np.zeros_like(p))
            self.tri_has_n.append(np.zeros(f, bool))
        if uvs is not None and len(uvs):
            self.tri_uv.append(np.asarray(uvs, np.float32)[indices])
        else:
            default_uv = np.array([[0, 0], [1, 0], [1, 1]], np.float32)
            self.tri_uv.append(np.broadcast_to(default_uv, (f, 3, 2)).copy())
        self.tri_mat.append(np.full(f, material_id, np.int32))
        self.tri_alpha.append(np.full(f, alpha_txd, np.int32))
        if emission is not None:
            light_ids = []
            for i in range(f):
                self.lights.append(dict(
                    ltype=LIGHT_AREA, emit=np.asarray(emission, np.float32),
                    tri=len(np.concatenate(self.tri_mat[:-1])) + i
                    if len(self.tri_mat) > 1 else i,
                    vec=np.zeros(3, np.float32)))
                light_ids.append(len(self.lights) - 1)
            self.tri_light.append(np.asarray(light_ids, np.int32))
        else:
            self.tri_light.append(np.full(f, -1, np.int32))

    def add_point_light(self, position, intensity) -> None:
        self.lights.append(dict(
            ltype=LIGHT_POINT, emit=np.asarray(intensity, np.float32),
            tri=-1, vec=np.asarray(position, np.float32)))

    def add_distant_light(self, direction, radiance) -> None:
        d = np.asarray(direction, np.float32)
        d = d / np.linalg.norm(d)
        self.lights.append(dict(
            ltype=LIGHT_DISTANT, emit=np.asarray(radiance, np.float32),
            tri=-1, vec=d))

    def set_environment(self, image: np.ndarray, light_to_world: np.ndarray,
                        scale: np.ndarray | float = 1.0) -> None:
        """Equirect HDR environment light (ref light.rs:321-398)."""
        img = np.asarray(image, np.float32) * np.asarray(scale, np.float32)
        self.env = dict(image=img, l2w=np.asarray(light_to_world, np.float32))
        self.lights.append(dict(
            ltype=LIGHT_INFINITE, emit=np.ones(3, np.float32),
            tri=-1, vec=np.zeros(3, np.float32)))

    def build(self) -> SceneData:
        from ..core.sampling import Distribution2D
        from ..core.math import luminance

        assert self.tri_p, "scene has no geometry"
        p = np.concatenate(self.tri_p)  # (F,3,3)
        n = np.concatenate(self.tri_n)
        has_n = np.concatenate(self.tri_has_n)
        uv = np.concatenate(self.tri_uv)
        mat = np.concatenate(self.tri_mat)
        lid = np.concatenate(self.tri_light)
        alpha_txd = np.concatenate(self.tri_alpha)

        # per-triangle geometric normal, face-forwarded toward the vertex
        # normals (constant across a triangle) — lets emission lookups skip
        # the full interaction build
        ng = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
        ns_c = n.mean(axis=1)
        flip = has_n & (np.einsum("fk,fk->f", ng, ns_c) < 0.0)
        ng = np.where(flip[:, None], -ng, ng).astype(np.float32)

        lo = p.reshape(-1, 3).min(0)
        hi = p.reshape(-1, 3).max(0)
        center = (lo + hi) / 2
        radius = float(np.linalg.norm(hi - center))

        m = max(1, len(self.materials))
        mats = self.materials or [dict(
            mtype=MAT_MATTE, kd=(0.5, 0.5, 0.5), ks=(0, 0, 0),
            eta=(1.5, 1.5, 1.5), k=(0, 0, 0), rough=(0, 0),
            misc=(0, 0, 0, 0), remap=False,
            kd_tx=-1, ks_tx=-1, metallic_tx=-1, rough_tx=-1, normal_tx=-1)]

        txds = self.txds or [dict(kind=0, rgb0=(0, 0, 0), rgb1=(0, 0, 0),
                                  scale=(1, 1, 1), uv=(1, 1, 0, 0), image=0,
                                  channel=-1, srgb=False)]

        nl = max(1, len(self.lights))
        lights = self.lights or [dict(ltype=LIGHT_POINT,
                                      emit=np.zeros(3, np.float32), tri=-1,
                                      vec=np.zeros(3, np.float32))]

        if self.env is not None:
            img = self.env["image"]  # (He, We, 3)
            he, we = img.shape[:2]
            # sin-theta-weighted luminance image at 2x resolution via the
            # mip lookup (ref light.rs:375-396). We sample the base image
            # bilinearly at the 2x grid — equivalent to lookup_width with a
            # tiny filter width.
            h2, w2 = 2 * he, 2 * we
            vs = (np.arange(h2) + 0.5) / h2
            us = (np.arange(w2) + 0.5) / w2
            sin_theta = np.sin(np.pi * vs)
            # bilinear sample of luminance
            from ..utils.image import bilinear_sample
            lum = np.asarray(img, np.float32) @ np.asarray(
                [0.212671, 0.715160, 0.072169], np.float32)
            samp = bilinear_sample(lum, us, vs)  # (h2, w2)
            func = (samp * sin_theta[:, None]).astype(np.float32)
            dist = Distribution2D.build(func)
            l2w = self.env["l2w"][:3, :3]
            env_fields = dict(
                env_map=_as_f32(img),
                env_cond_func=dist.cond_func, env_cond_cdf=dist.cond_cdf,
                env_cond_int=dist.cond_int, env_marg_func=dist.marg_func,
                env_marg_cdf=dist.marg_cdf, env_marg_int=dist.marg_int,
                env_to_world=_as_f32(l2w),
                world_to_env=_as_f32(np.linalg.inv(l2w)),
                has_env=np.asarray(True),
            )
        else:
            z1 = np.zeros((1, 1), np.float32)
            env_fields = dict(
                env_map=_as_f32(np.zeros((1, 1, 3))),
                env_cond_func=_as_f32(z1),
                env_cond_cdf=_as_f32(np.zeros((1, 2))),
                env_cond_int=_as_f32(np.zeros(1)),
                env_marg_func=_as_f32(np.zeros(1)),
                env_marg_cdf=_as_f32(np.zeros(2)),
                env_marg_int=np.float32(0.0),
                env_to_world=_as_f32(np.eye(3)),
                world_to_env=_as_f32(np.eye(3)),
                has_env=np.asarray(False),
            )

        has_env = env_fields.pop("has_env")
        return SceneData(
            p0=_as_f32(p[:, 0]), p1=_as_f32(p[:, 1]), p2=_as_f32(p[:, 2]),
            n0=_as_f32(n[:, 0]), n1=_as_f32(n[:, 1]), n2=_as_f32(n[:, 2]),
            has_normals=np.asarray(has_n),
            uv0=_as_f32(uv[:, 0]), uv1=_as_f32(uv[:, 1]), uv2=_as_f32(uv[:, 2]),
            material_id=np.asarray(mat, np.int32),
            area_light_id=np.asarray(lid, np.int32),
            tri_ng=_as_f32(ng),
            tri_alpha_txd=np.asarray(alpha_txd, np.int32),
            mat_type=np.asarray([mm["mtype"] for mm in mats], np.int32),
            mat_kd=_as_f32([mm["kd"] for mm in mats]),
            mat_ks=_as_f32([mm["ks"] for mm in mats]),
            mat_eta=_as_f32([mm["eta"] for mm in mats]),
            mat_k=_as_f32([mm["k"] for mm in mats]),
            mat_rough=_as_f32([mm["rough"] for mm in mats]),
            mat_misc=_as_f32([mm["misc"] for mm in mats]),
            mat_remap=np.asarray([bool(mm["remap"]) for mm in mats]),
            mat_kd_tx=np.asarray([mm["kd_tx"] for mm in mats], np.int32),
            mat_ks_tx=np.asarray([mm["ks_tx"] for mm in mats], np.int32),
            mat_metallic_tx=np.asarray(
                [mm["metallic_tx"] for mm in mats], np.int32),
            mat_rough_tx=np.asarray(
                [mm["rough_tx"] for mm in mats], np.int32),
            mat_normal_tx=np.asarray(
                [mm["normal_tx"] for mm in mats], np.int32),
            txd_kind=np.asarray([t["kind"] for t in txds], np.int32),
            txd_rgb0=_as_f32([t["rgb0"] for t in txds]),
            txd_rgb1=_as_f32([t["rgb1"] for t in txds]),
            txd_scale=_as_f32([t["scale"] for t in txds]),
            txd_uv=_as_f32([t["uv"] for t in txds]),
            txd_image=np.asarray([t["image"] for t in txds], np.int32),
            txd_channel=np.asarray([t["channel"] for t in txds], np.int32),
            txd_srgb=np.asarray([bool(t["srgb"]) for t in txds]),
            tex=self.tex_pool.build(),
            light_type=np.asarray([l["ltype"] for l in lights], np.int32),
            light_emit=_as_f32([l["emit"] for l in lights]),
            light_tri=np.asarray([l["tri"] for l in lights], np.int32),
            light_vec=_as_f32([l["vec"] for l in lights]),
            **env_fields,
            world_center=_as_f32(center),
            world_radius=np.float32(radius),
            n_lights=np.int32(len(self.lights)),
            has_env=has_env,
        )
