"""Vectorized light sampling: area / point / distant / infinite.

Parity with reference ``src/pathtracer/light.rs`` (PointLight :86-150,
DirectionalLight :152-229, DiffuseAreaLight :231-319, InfiniteAreaLight
:321-503) and triangle area sampling (shape.rs:50-72,541-578). One light is
chosen per shading point by a categorical draw (uniform_sample_one_light,
integrator.rs:192-217); all light types are evaluated branchlessly and the
per-ray result selected by the chosen light's type.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import math as pm
from ..core.math import gamma
from ..core.sampling import uniform_sample_triangle, sample_distribution_1d, \
    jax_searchsorted_batched
from ..scene.scene import (LA_EMIT, LA_HASN, LA_N0, LA_N1, LA_N2, LA_P0,
                           LA_P1, LA_P2, LA_TYPE, LA_VEC, LIGHT_AREA,
                           LIGHT_DISTANT, LIGHT_INFINITE, LIGHT_POINT)
from .intersect import watertight_hit_diag

GAMMA6 = gamma(6)


def _tri_area(p0, p1, p2):
    return 0.5 * pm.norm(jnp.cross(p1 - p0, p2 - p0))


def _tri_sample(rows, u):
    """Uniform point on the light's triangle with face-forwarded normal
    (ref shape.rs:541-578). rows: (N, LA_WIDTH) pre-gathered light rows.
    Returns (p, n, p_error)."""
    p0, p1, p2 = rows[:, LA_P0], rows[:, LA_P1], rows[:, LA_P2]
    b = uniform_sample_triangle(u)
    b0, b1 = b[..., 0:1], b[..., 1:2]
    b2 = 1.0 - b0 - b1
    p = b0 * p0 + b1 * p1 + b2 * p2
    n = pm.normalize(jnp.cross(p1 - p0, p2 - p0))
    has_n = rows[:, LA_HASN] > 0.5
    ns = b0 * rows[:, LA_N0] + b1 * rows[:, LA_N1] + b2 * rows[:, LA_N2]
    n = jnp.where(has_n[..., None], pm.face_forward(n, ns), n)
    p_err = GAMMA6 * (jnp.abs(b0 * p0) + jnp.abs(b1 * p1) + jnp.abs(b2 * p2))
    return p, n, p_err


def env_direction_to_uv(scene, w_world):
    """World direction → equirect uv (ref light.rs:488-498)."""
    w = pm.normalize(w_world @ scene.world_to_env.T)
    return jnp.stack([pm.spherical_phi(w) * pm.INV_2_PI,
                      pm.spherical_theta(w) * pm.INV_PI], axis=-1)


def env_lookup(scene, uv):
    """Bilinear env map lookup at uv (MIPMap lookup_width(st, 0), level 0)."""
    img = scene.env_map
    h, w = img.shape[0], img.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xm = jnp.mod(x0, w)  # repeat wrap (ref WrapMode::Repeat)
    xp = jnp.mod(x0 + 1, w)
    ym = jnp.clip(y0, 0, h - 1)
    yp = jnp.clip(y0 + 1, 0, h - 1)
    top = img[ym, xm] * (1 - fx) + img[ym, xp] * fx
    bot = img[yp, xm] * (1 - fx) + img[yp, xp] * fx
    return top * (1 - fy) + bot * fy


def env_le(scene, d_world):
    """Escaped-ray radiance from the environment (ref light.rs:488-498)."""
    uv = env_direction_to_uv(scene, d_world)
    le = env_lookup(scene, uv)
    return jnp.where(scene.has_env, le, jnp.zeros_like(le))


def _env_sample_li(scene, u):
    """Importance-sample the env map 2D CDF (ref light.rs:401-441).

    Returns (wi_world, pdf, radiance)."""
    # marginal over v
    d1, pdf1, v = sample_distribution_1d(
        scene.env_marg_func, scene.env_marg_cdf, scene.env_marg_int,
        u[..., 1])
    nu = scene.env_cond_func.shape[-1]
    cdf_v = scene.env_cond_cdf[v]
    func_v = scene.env_cond_func[v]
    int_v = scene.env_cond_int[v]
    off = jnp.clip(jax_searchsorted_batched(cdf_v, u[..., 0]), 0, nu - 1)
    c0 = jnp.take_along_axis(cdf_v, off[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cdf_v, off[..., None] + 1, axis=-1)[..., 0]
    denom = c1 - c0
    du = jnp.where(denom > 0, (u[..., 0] - c0) / jnp.where(denom > 0, denom, 1.0),
                   u[..., 0] - c0)
    fv = jnp.take_along_axis(func_v, off[..., None], axis=-1)[..., 0]
    pdf0 = jnp.where(int_v > 0, fv / jnp.maximum(int_v, 1e-30), 0.0)
    d0 = (off.astype(jnp.float32) + du) / nu
    uv = jnp.stack([d0, d1], axis=-1)
    map_pdf = pdf0 * pdf1

    theta = uv[..., 1] * np.pi
    phi = uv[..., 0] * 2.0 * np.pi
    sin_t = jnp.sin(theta)
    w_local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                         jnp.cos(theta)], axis=-1)
    wi = w_local @ scene.env_to_world.T
    pdf = jnp.where(sin_t == 0.0, 0.0,
                    map_pdf / (2.0 * np.pi * np.pi * jnp.maximum(sin_t, 1e-20)))
    le = env_lookup(scene, uv)
    ok = map_pdf > 0.0
    return wi, jnp.where(ok, pdf, 0.0), jnp.where(ok[..., None], le, 0.0)


def env_pdf_li(scene, w_world):
    """pdf of the env light along a world direction (ref light.rs:447-460)."""
    w = pm.normalize(w_world @ scene.world_to_env.T)
    theta = pm.spherical_theta(w)
    phi = pm.spherical_phi(w)
    sin_t = jnp.sin(theta)
    uv = jnp.stack([phi * pm.INV_2_PI, theta * pm.INV_PI], axis=-1)
    nv, nu = scene.env_cond_func.shape
    iu = jnp.clip((uv[..., 0] * nu).astype(jnp.int32), 0, nu - 1)
    iv = jnp.clip((uv[..., 1] * nv).astype(jnp.int32), 0, nv - 1)
    d2 = scene.env_cond_func[iv, iu] / jnp.maximum(scene.env_marg_int, 1e-30)
    pdf = d2 / (2.0 * np.pi * np.pi * jnp.maximum(sin_t, 1e-20))
    return jnp.where((sin_t == 0.0) | ~scene.has_env, 0.0, pdf)


def sample_li(scene, light_rows, ref_p, ref_err, ref_n, u,
              light_set=(LIGHT_AREA, LIGHT_POINT, LIGHT_DISTANT,
                         LIGHT_INFINITE)):
    """sample_li for the chosen light of each ray.

    scene: SceneData (env tables); light_rows: (N, LA_WIDTH) pre-gathered
    packed rows of each ray's chosen light (ops/gather.take_rows on
    TracedScene.light_attr); light_set: static set of light types present —
    absent types compile out (scene-adaptive specialization). Returns
    dict(wi (N,3) unit, pdf (N,), li (N,3), vis_target_p, vis_target_err,
    vis_target_n, is_delta (N,)).
    """
    ltype = light_rows[:, LA_TYPE].astype(jnp.int32)
    emit = light_rows[:, LA_EMIT]
    lvec = light_rows[:, LA_VEC]
    n = ref_p.shape[0]
    zero1 = jnp.zeros((n,), jnp.float32)
    zero3 = jnp.zeros((n, 3), jnp.float32)

    preds, wis, pdfs, lis, targets, terrs, tns = [], [], [], [], [], [], []

    if LIGHT_AREA in light_set:
        # ---- area light (light.rs:261-280)
        ps, ns, perr = _tri_sample(light_rows, u)
        wi_area = pm.normalize(ps - ref_p)
        pdf_area = _tri_pdf_along_sampled(light_rows, ref_p, ref_err, ref_n,
                                          wi_area)
        # one-sided emission toward the receiver (light.rs:252-258)
        li_area = jnp.where((pm.dot(ns, -wi_area) > 0.0)[..., None],
                            emit, 0.0)
        preds.append(ltype == LIGHT_AREA)
        wis.append(wi_area)
        pdfs.append(pdf_area)
        lis.append(li_area)
        targets.append(ps)
        terrs.append(perr)
        tns.append(ns)

    if LIGHT_POINT in light_set:
        # ---- point light (light.rs:100-121)
        to_l = lvec - ref_p
        dist_sq_p = pm.norm_sq(to_l)
        wi_point = to_l / jnp.sqrt(jnp.maximum(dist_sq_p, 1e-30))[..., None]
        li_point = emit / jnp.maximum(dist_sq_p, 1e-30)[..., None]
        preds.append(ltype == LIGHT_POINT)
        wis.append(wi_point)
        pdfs.append(jnp.ones_like(zero1))
        lis.append(li_point)
        targets.append(jnp.broadcast_to(lvec, ref_p.shape))
        terrs.append(zero3)
        tns.append(zero3)

    if LIGHT_DISTANT in light_set:
        # ---- distant light (light.rs:174-196)
        wi_dist = lvec
        p_outside = ref_p + wi_dist * (2.0 * scene.world_radius)
        preds.append(ltype == LIGHT_DISTANT)
        wis.append(wi_dist)
        pdfs.append(jnp.ones_like(zero1))
        lis.append(emit)
        targets.append(p_outside)
        terrs.append(zero3)
        tns.append(zero3)

    if LIGHT_INFINITE in light_set:
        # ---- infinite light (light.rs:401-441)
        wi_env, pdf_env, li_env = _env_sample_li(scene, u)
        preds.append(ltype == LIGHT_INFINITE)
        wis.append(wi_env)
        pdfs.append(pdf_env)
        lis.append(li_env)
        targets.append(ref_p + wi_env * (2.0 * scene.world_radius))
        terrs.append(zero3)
        tns.append(zero3)

    def sel(vals, default):
        if len(vals) == 1:
            return vals[0]
        sel_p = [p[..., None] for p in preds] if vals[0].ndim == 2 else preds
        return jnp.select(sel_p, vals, default)

    wi = sel(wis, wis[0])
    pdf = sel(pdfs, zero1)
    li = sel(lis, zero3)
    target_p = sel(targets, targets[0])
    target_err = sel(terrs, zero3)
    target_n = sel(tns, zero3)
    is_delta = (ltype == LIGHT_POINT) | (ltype == LIGHT_DISTANT)
    return dict(wi=wi, pdf=pdf, li=li, target_p=target_p,
                target_err=target_err, target_n=target_n, is_delta=is_delta,
                is_env=ltype == LIGHT_INFINITE, is_area=ltype == LIGHT_AREA)


def _tri_pdf_along_sampled(rows, ref_p, ref_err, ref_n, wi):
    """pdf_at_point via single-triangle re-intersection (shape.rs:62-72).

    rows: (N, LA_WIDTH) pre-gathered light rows."""
    o = pm.offset_ray_origin(ref_p, ref_err, ref_n, wi)
    p0, p1, p2 = rows[:, LA_P0], rows[:, LA_P1], rows[:, LA_P2]
    t, b, hit = watertight_hit_diag(
        o, wi, jnp.full(wi.shape[:-1], jnp.inf, wi.dtype), p0, p1, p2)
    hp = o + t[..., None] * wi
    n = pm.normalize(jnp.cross(p0 - p2, p1 - p2))
    area = _tri_area(p0, p1, p2)
    dist_sq = pm.norm_sq(ref_p - hp)
    cos_abs = jnp.abs(pm.dot(n, -wi))
    pdf = dist_sq / jnp.maximum(cos_abs * area, 1e-20)
    return jnp.where(hit, pdf, 0.0)


def pdf_li(scene, light_rows, ref_p, ref_err, ref_n, wi,
           light_set=(LIGHT_AREA, LIGHT_POINT, LIGHT_DISTANT,
                      LIGHT_INFINITE)):
    """pdf of the chosen light along wi (for MIS BSDF branch).

    Delta lights return 0 (light.rs:127-129,202-204); absent light types
    compile out via the static light_set."""
    ltype = light_rows[:, LA_TYPE].astype(jnp.int32)
    preds, pdfs = [], []
    if LIGHT_AREA in light_set:
        preds.append(ltype == LIGHT_AREA)
        pdfs.append(_tri_pdf_along_sampled(light_rows, ref_p, ref_err,
                                           ref_n, wi))
    if LIGHT_INFINITE in light_set:
        preds.append(ltype == LIGHT_INFINITE)
        pdfs.append(env_pdf_li(scene, wi))
    if not preds:
        return jnp.zeros(wi.shape[:-1], jnp.float32)
    if len(preds) == 1 and len(light_set) == 1:
        return pdfs[0]
    return jnp.select(preds, pdfs, 0.0)
