"""Surface interaction construction from hit records (SoA).

Parity with reference ``src/pathtracer/shape.rs:187-356`` (partial
derivatives from UVs, shading geometry with face-forwarded geometric
normal) and ``src/pathtracer/interaction.rs`` (robust spawn_ray/_to with
SHADOW_EPSILON, le() lookup). Hits are gathered per ray from the packed
triangle soup; the BSDF shading frame (ss, ts, ns) is computed here once
per bounce for all rays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math as pm
from ..scene.scene import (TA_DPDU, TA_DPDV, TA_HASN, TA_KE, TA_LID, TA_MAT,
                           TA_N0, TA_N1, TA_N2, TA_NG0, TA_NGF, TA_P0, TA_P1,
                           TA_P2, TA_UV0, TA_UV1, TA_UV2)
from .gather import take_rows
from .intersect import GAMMA7


def make_interaction(scene, o, d, hit, tri_attr):
    """Build SoA interaction data for a batch of hits.

    scene: SceneData; o, d: (N, 3) ray origin/dir; hit: dict from
    intersect_*; tri_attr: (F, TA_WIDTH) packed per-tri attributes — ONE
    row fetch replaces the dozen separate per-field gathers, and the
    per-triangle constants (dpdu/dpdv with degenerate fallback, unit
    geometric normal) are precomputed at scene build. Returns a dict of
    arrays; entries are garbage where hit["valid"] is False (caller masks).
    """
    tri = hit["tri"]
    b = hit["b"]  # (N, 3)
    rows = take_rows(tri_attr, tri)  # (N, TA_WIDTH)
    p0, p1, p2 = rows[:, TA_P0], rows[:, TA_P1], rows[:, TA_P2]
    uv0, uv1, uv2 = rows[:, TA_UV0], rows[:, TA_UV1], rows[:, TA_UV2]

    b0, b1, b2 = b[..., 0:1], b[..., 1:2], b[..., 2:3]
    p_hit = b0 * p0 + b1 * p1 + b2 * p2
    uv_hit = b0 * uv0 + b1 * uv1 + b2 * uv2
    p_error = GAMMA7 * (jnp.abs(b0 * p0) + jnp.abs(b1 * p1) + jnp.abs(b2 * p2))

    # partial derivatives from the UV parameterization are per-triangle
    # constants (ref shape.rs:187-215) — precomputed in pack_tri_attr
    dpdu = rows[:, TA_DPDU]
    dpdv = rows[:, TA_DPDV]
    ng = rows[:, TA_NG0]

    # shading geometry (ref shape.rs:268-356)
    has_n = rows[:, TA_HASN] > 0.5
    ns_interp = b0 * rows[:, TA_N0] + b1 * rows[:, TA_N1] + b2 * rows[:, TA_N2]
    ns_len = pm.norm_sq(ns_interp)
    ns = jnp.where((has_n & (ns_len > 0.0))[..., None],
                   ns_interp / jnp.sqrt(jnp.maximum(ns_len, 1e-30))[..., None],
                   ng)
    # geometric normal face-forwarded to shading normal (orientation
    # authoritative, ref interaction.rs:203-205)
    ng = jnp.where(has_n[..., None], pm.face_forward(ng, ns), ng)

    # shading tangent frame
    ss0 = pm.normalize(dpdu)
    ts = jnp.cross(ss0, ns)
    ts_len = pm.norm_sq(ts)
    ts_n = ts / jnp.sqrt(jnp.maximum(ts_len, 1e-30))[..., None]
    ss = jnp.where((ts_len > 0.0)[..., None], jnp.cross(ts_n, ns), ss0)
    cs_u, _ = pm.coordinate_system(ns)
    ss = jnp.where((ts_len > 0.0)[..., None], ss, cs_u)

    # BSDF frame (ref bsdf.rs:20-33): ss_b = normalize(dpdu-orthonormalized),
    # ts_b = ns × ss_b
    ts_b = jnp.cross(ns, ss)

    return dict(
        p=p_hit, p_error=p_error, uv=uv_hit, wo=-d,
        ng=ng, ns=ns, ss=ss, ts=ts_b,
        dpdu=dpdu, dpdv=dpdv,
        material=rows[:, TA_MAT].astype(jnp.int32),
        area_light=rows[:, TA_LID].astype(jnp.int32),
        ke=rows[:, TA_KE],
        tri=tri,
    )


def compute_duv(it, o, rxd, ryd):
    """Screen-space (u, v) derivatives at hits (ref interaction.rs:216-281).

    Intersects the two auxiliary camera rays (shared origin o, directions
    rxd/ryd) with the tangent plane at the hit, then solves the 2x2 system
    [dpdu dpdv] @ [dudx dvdx]^T = dpdx in the two most stable dimensions.
    Returns (dudx, dvdx, dudy, dvdy), zeros on degenerate geometry.
    DEVIATION: the reference's dimension pick compares n.y twice
    (interaction.rs:241 `n.x.abs() > n.y.abs() && n.x.abs() > n.y.abs()`);
    we use the intended PBRT test against n.z.
    """
    n = it["ng"]
    p = it["p"]
    d_plane = pm.dot(n, p)

    def plane_hit(rd):
        t = -(pm.dot(n, o) - d_plane) / pm.dot(n, rd)
        return o + t[..., None] * rd, jnp.isfinite(t)

    px, okx = plane_hit(rxd)
    py, oky = plane_hit(ryd)
    dpdx = px - p
    dpdy = py - p

    an = jnp.abs(n)
    use_x = (an[..., 0] > an[..., 1]) & (an[..., 0] > an[..., 2])
    use_y = ~use_x & (an[..., 1] > an[..., 2])
    dim0 = jnp.where(use_x, 1, 0)
    dim1 = jnp.where(use_x | use_y, 2, 1)

    def take(v, k):
        return jnp.where(k == 0, v[..., 0],
                         jnp.where(k == 1, v[..., 1], v[..., 2]))

    a00 = take(it["dpdu"], dim0)
    a01 = take(it["dpdv"], dim0)
    a10 = take(it["dpdu"], dim1)
    a11 = take(it["dpdv"], dim1)
    det = a00 * a11 - a01 * a10
    ok_det = jnp.abs(det) >= 1e-10  # solve_linear_system_2x2, math.rs:149-163
    inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
    ok = okx & oky  # reference zeroes everything when either t is non-finite

    def solve(dp):
        b0, b1 = take(dp, dim0), take(dp, dim1)
        du = (a11 * b0 - a01 * b1) * inv_det
        dv = (a00 * b1 - a10 * b0) * inv_det
        good = ok & ok_det & jnp.isfinite(du) & jnp.isfinite(dv)
        return jnp.where(good, du, 0.0), jnp.where(good, dv, 0.0)

    dudx, dvdx = solve(dpdx)
    dudy, dvdy = solve(dpdy)
    return dudx, dvdx, dudy, dvdy


def apply_normal_mapping(scene, it, duv=None):
    """Perturb the shading frame by tangent-space normal maps.

    Ref material/mod.rs:39-78 NormalMaterial: n' = normalize(TBN @ n_tex),
    then rebuild the tangent frame. We use the orthonormalized (ss, ts, ns)
    frame as TBN (the reference uses raw dpdu/dpdv and marks its own TBN
    math known-buggy, material/mod.rs:38).
    """
    from .bsdf import eval_texture
    ntx = scene.mat_normal_tx[it["material"]]
    has = ntx >= 0
    rgb = eval_texture(scene, ntx, it["uv"],
                       jnp.broadcast_to(jnp.asarray([0.5, 0.5, 1.0]),
                                        it["ns"].shape), duv=duv)
    n_tan = pm.normalize(2.0 * rgb - 1.0)
    ns_new = pm.normalize(
        n_tan[..., 0:1] * it["ss"] + n_tan[..., 1:2] * it["ts"]
        + n_tan[..., 2:3] * it["ns"])
    ss0 = it["ss"]
    ts = jnp.cross(ss0, ns_new)
    ts_len = pm.norm_sq(ts)
    ts_n = ts / jnp.sqrt(jnp.maximum(ts_len, 1e-30))[..., None]
    ss = jnp.where((ts_len > 0.0)[..., None], jnp.cross(ts_n, ns_new), ss0)
    cs_u, _ = pm.coordinate_system(ns_new)
    ss = jnp.where((ts_len > 0.0)[..., None], ss, cs_u)
    out = dict(it)
    out["ns"] = jnp.where(has[..., None], ns_new, it["ns"])
    out["ss"] = jnp.where(has[..., None], ss, it["ss"])
    out["ts"] = jnp.where(has[..., None], jnp.cross(ns_new, ss), it["ts"])
    out["ng"] = jnp.where(has[..., None],
                          pm.face_forward(it["ng"], ns_new), it["ng"])
    return out


def emitted_radiance(it, w):
    """Le at a hit toward w (ref light.rs:252-258: one-sided area light).

    it: interaction dict (carries the per-tri ke from the packed gather);
    w: (N, 3) direction (usually -ray.d). Returns (N, 3); zero where the
    hit isn't an emitter or faces away.
    """
    is_emitter = it["area_light"] >= 0
    facing = pm.dot(it["ng"], w) > 0.0
    return jnp.where((is_emitter & facing)[..., None], it["ke"], 0.0)


def hit_emission(tri_attr, hit, w):
    """(Le, area-light id) at a raw hit record, one packed row fetch.

    Uses the precomputed per-triangle face-forwarded geometric normal
    (TA_NGF) for the one-sided test (light.rs:252-258). The returned light
    id feeds the MIS branch's hit-the-light check (integrator.rs:82-136).
    """
    rows = take_rows(tri_attr, hit["tri"])
    lid = rows[:, TA_LID].astype(jnp.int32)
    is_emitter = hit["valid"] & (lid >= 0)
    facing = pm.dot(rows[:, TA_NGF], w) > 0.0
    le = jnp.where((is_emitter & facing)[..., None], rows[:, TA_KE], 0.0)
    return le, jnp.where(hit["valid"], lid, -1)


def spawn_ray(p, p_error, n, d):
    """Offset origin robustly along n for direction d (ref interaction.rs:32-39)."""
    return pm.offset_ray_origin(p, p_error, n, d)


def spawn_ray_to(p, p_error, n, target_p, target_err, target_n):
    """Shadow ray between two interactions (ref interaction.rs:50-59).

    Returns (origin, direction (unnormalized), t_max = 1 - SHADOW_EPSILON).
    """
    o = pm.offset_ray_origin(p, p_error, n, target_p - p)
    tgt = pm.offset_ray_origin(target_p, target_err, target_n, o - target_p)
    d = tgt - o
    t_max = jnp.full(d.shape[:-1], 1.0 - pm.SHADOW_EPSILON, d.dtype)
    return o, d, t_max
