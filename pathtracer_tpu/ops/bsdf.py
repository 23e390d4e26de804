"""Vectorized BSDF library: sample / eval / pdf for all material models.

Replaces the reference's per-hit BSDF object graph (bsdf.rs BSDF aggregator,
bxdf/mod.rs Lambertian, bxdf/fresnel.rs specular lobes, bxdf/microfacet.rs
Trowbridge-Reitz lobes, material/{mod,metal,substrate,disney}.rs) with
branchless wavefront math: every material model is evaluated for the whole
batch and the per-ray result selected by material type. All directions here
are in the local shading frame (z = shading normal); the integrator converts
world<->local with the per-hit (ss, ts, ns) frame.

Material table semantics (matching compute_scattering_functions):
  MATTE     — LambertianReflection(kd)                 (material/mod.rs:155-167)
  MIRROR    — SpecularReflection(1, NoOp fresnel)       (material/mod.rs:180-195)
  GLASS     — FresnelSpecular(kr, kt, 1, eta)           (material/mod.rs:216-256)
  METAL     — MicrofacetReflection(ks, TR(ax,ay), Conductor(1, eta, k))
                                                        (material/metal.rs:49-94)
  SUBSTRATE — FresnelBlend(kd, ks, TR(ax, ay))          (material/substrate.rs:42-69)
  DISNEY    — DisneyDiffuse(w*c) + MicrofacetReflection(1, DisneyTR,
              DisneyFresnel(c_spec0, metallic, eta))    (material/disney.rs:172-264)
  ROUGHGLASS— MicrofacetReflection(kd, TR, Dielectric) +
              MicrofacetTransmission(ks, TR, 1, eta)    (bxdf/microfacet.rs:176-384;
              the lobe the reference defines but never instantiates —
              Glass's roughness is TODO, material/mod.rs:216-256)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import math as pm
from ..core.math import ONE_MINUS_EPSILON
from ..core.sampling import cosine_sample_hemisphere
from ..scene.scene import (MAT_DISNEY, MAT_GLASS, MAT_MATTE, MAT_METAL,
                           MAT_MIRROR, MAT_ROUGHGLASS, MAT_SUBSTRATE)

INV_PI = np.float32(1.0 / np.pi)


# ---------------------------------------------------------------- local frame
def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


def reflect_local(wo):
    return jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)


def reflect_about(wo, n):
    return -wo + 2.0 * pm.dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Snell refraction (ref bxdf/mod.rs:73-89). Returns (wt, ok)."""
    cos_i = pm.dot(n, wi)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wt = eta[..., None] * -wi + (eta * cos_i - cos_t)[..., None] * n
    return wt, ok


# ------------------------------------------------------------------- fresnel
def fr_dielectric(cos_i, eta_i, eta_t):
    """Dielectric Fresnel, handles both sides (ref fresnel.rs:21-40)."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(cos_i)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-20)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-20)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fr_conductor(cos_i, eta_i, eta_t, k):
    """Full complex-IOR conductor Fresnel, rgb (ref fresnel.rs:42-64)."""
    ci = jnp.clip(cos_i, -1.0, 1.0)[..., None]
    eta = eta_t / eta_i
    etak = k / eta_i
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - si2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2b2 + ci2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * ci * a
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def schlick_weight(cos_t):
    m = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    return (m * m) * (m * m) * m


def fr_schlick_spectrum(r0, cos_t):
    return pm.lerp(r0, jnp.ones_like(r0), schlick_weight(cos_t)[..., None])


def disney_fresnel(c_spec0, metallic, eta, cos_i):
    """Lerp dielectric↔Schlick by metallic (ref disney.rs:128-136)."""
    diel = fr_dielectric(cos_i, jnp.ones_like(cos_i), eta)[..., None]
    schlick = fr_schlick_spectrum(c_spec0, cos_i)
    return pm.lerp(jnp.broadcast_to(diel, schlick.shape), schlick,
                   metallic[..., None])


# ------------------------------------------------- Trowbridge-Reitz (GGX)
def roughness_to_alpha(roughness):
    """Log-poly roughness remap (ref microfacet.rs:119-127)."""
    r = jnp.maximum(roughness, 1e-3)
    x = jnp.log(r)
    return (1.62142 + 0.819955 * x + 0.1734 * x ** 2 + 0.0171201 * x ** 3
            + 0.000640711 * x ** 4)


def tr_d(wh, ax, ay):
    """GGX normal distribution (ref microfacet.rs:131-146)."""
    c2 = wh[..., 2] * wh[..., 2]
    s2 = jnp.maximum(0.0, 1.0 - c2)
    tan2 = s2 / jnp.maximum(c2, 1e-20)
    finite = c2 > 0.0
    cos4 = c2 * c2
    # cos/sin phi of wh
    sin_t = jnp.sqrt(s2)
    inv_sin = 1.0 / jnp.maximum(sin_t, 1e-20)
    cphi = jnp.where(sin_t == 0.0, 1.0, jnp.clip(wh[..., 0] * inv_sin, -1, 1))
    sphi = jnp.where(sin_t == 0.0, 1.0, jnp.clip(wh[..., 1] * inv_sin, -1, 1))
    e = (cphi * cphi / (ax * ax) + sphi * sphi / (ay * ay)) * tan2
    d = 1.0 / (np.pi * ax * ay * cos4 * (1.0 + e) * (1.0 + e))
    return jnp.where(finite, d, 0.0)


def tr_lambda(w, ax, ay):
    """Smith masking Lambda (ref microfacet.rs:148-158)."""
    c2 = w[..., 2] * w[..., 2]
    s2 = jnp.maximum(0.0, 1.0 - c2)
    abs_tan = jnp.sqrt(s2) / jnp.maximum(jnp.abs(w[..., 2]), 1e-20)
    finite = c2 > 0.0
    sin_t = jnp.sqrt(s2)
    inv_sin = 1.0 / jnp.maximum(sin_t, 1e-20)
    cphi = jnp.where(sin_t == 0.0, 1.0, jnp.clip(w[..., 0] * inv_sin, -1, 1))
    sphi = jnp.where(sin_t == 0.0, 1.0, jnp.clip(w[..., 1] * inv_sin, -1, 1))
    alpha = jnp.sqrt(cphi * cphi * ax * ax + sphi * sphi * ay * ay)
    a2t2 = (alpha * abs_tan) * (alpha * abs_tan)
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(finite, lam, 0.0)


def tr_g1(w, ax, ay):
    return 1.0 / (1.0 + tr_lambda(w, ax, ay))


def tr_g(wo, wi, ax, ay, separable=None):
    """Smith G; `separable` mask switches to G1*G1 (Disney, disney.rs:159-161)."""
    joint = 1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay))
    if separable is None:
        return joint
    sep = tr_g1(wo, ax, ay) * tr_g1(wi, ax, ay)
    return jnp.where(separable, sep, joint)


def _tr_sample_11(cos_t, u1, u2):
    """Visible-normal slope sampling (ref microfacet.rs:32-81), batched."""
    # normal-incidence branch
    r_ni = jnp.sqrt(jnp.maximum(u1 / jnp.maximum(1.0 - u1, 1e-20), 0.0))
    phi_ni = 2.0 * np.pi * u2
    sx_ni = r_ni * jnp.cos(phi_ni)
    sy_ni = r_ni * jnp.sin(phi_ni)

    # general branch (guard all divisions; selected only when cos_t <= 0.9999)
    ct = jnp.clip(cos_t, 1e-6, 0.9999)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    tan_t = sin_t / ct
    a = 1.0 / tan_t
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / (a * a)))
    A = 2.0 * u1 / g1 - 1.0
    denom = A * A - 1.0
    tmp = jnp.where(denom == 0.0, 1e10, 1.0 / jnp.where(denom == 0.0, 1.0, denom))
    tmp = jnp.minimum(tmp, 1e10)
    B = tan_t
    D = jnp.sqrt(jnp.maximum(B * B * tmp * tmp - (A * A - B * B) * tmp, 0.0))
    sx1 = B * tmp - D
    sx2 = B * tmp + D
    sx = jnp.where((A < 0.0) | (sx2 > 1.0 / tan_t), sx1, sx2)
    flip = u2 > 0.5
    s = jnp.where(flip, 1.0, -1.0)
    u2b = jnp.where(flip, 2.0 * (u2 - 0.5), 2.0 * (0.5 - u2))
    z = (u2b * (u2b * (u2b * 0.27385 - 0.73369) + 0.46341)) / \
        (u2b * (u2b * (u2b * 0.093073 + 0.309420) - 1.000000) + 0.597999)
    sy = s * z * jnp.sqrt(1.0 + sx * sx)

    ni = cos_t > 0.9999
    return jnp.where(ni, sx_ni, sx), jnp.where(ni, sy_ni, sy)


def tr_sample_wh(wo, u, ax, ay):
    """Sample the visible GGX normal (ref microfacet.rs:83-104,160-169)."""
    flip = wo[..., 2] < 0.0
    w = jnp.where(flip[..., None], -wo, wo)
    wi_str = pm.normalize(jnp.stack(
        [ax * w[..., 0], ay * w[..., 1], w[..., 2]], axis=-1))
    sx, sy = _tr_sample_11(cos_theta(wi_str), u[..., 0], u[..., 1])
    s2 = jnp.maximum(0.0, 1.0 - wi_str[..., 2] ** 2)
    sin_t = jnp.sqrt(s2)
    inv_sin = 1.0 / jnp.maximum(sin_t, 1e-20)
    cphi = jnp.where(sin_t == 0.0, 1.0, jnp.clip(wi_str[..., 0] * inv_sin, -1, 1))
    sphi = jnp.where(sin_t == 0.0, 1.0, jnp.clip(wi_str[..., 1] * inv_sin, -1, 1))
    tmp = cphi * sx - sphi * sy
    sy = sphi * sx + cphi * sy
    sx = tmp
    sx = ax * sx
    sy = ay * sy
    wh = pm.normalize(jnp.stack([-sx, -sy, jnp.ones_like(sx)], axis=-1))
    return jnp.where(flip[..., None], -wh, wh)


def tr_pdf(wo, wh, ax, ay):
    """Visible-normal pdf (ref microfacet.rs:171-173)."""
    return tr_d(wh, ax, ay) * tr_g1(wo, ax, ay) * \
        jnp.abs(pm.dot(wo, wh)) / jnp.maximum(abs_cos_theta(wo), 1e-20)


# ---------------------------------------------------------------- textures
def eval_texture(scene, txd_id, uv, fallback, duv=None):
    """Evaluate a texture descriptor at uv; fallback where txd_id < 0.

    Implements the reference Texture dispatch: ConstantTexture
    (texture.rs:15-29), CheckerTexture with UVMap (:31-89), ImageTexture
    via the mip pool (:91-192). duv = (dudx, dvdx, dudy, dvdy) screen-space
    UV derivatives (interaction.compute_duv): the UVMap scales them by
    (su, sv) into dst/dx, dst/dy (texture.rs:47-52) and the mip filter
    width is their max abs component (texture.rs:430-445); width 0 when
    differentials are absent (matching non-camera bounces, whose rays
    carry no differentials in the reference either).
    """
    from ..scene.texture import lookup_width as pool_lookup

    safe = jnp.maximum(txd_id, 0)
    kind = scene.txd_kind[safe]
    uvm = scene.txd_uv[safe]
    st = jnp.stack([uv[..., 0] * uvm[..., 0] + uvm[..., 2],
                    uv[..., 1] * uvm[..., 1] + uvm[..., 3]], axis=-1)
    if duv is None:
        width = 0.0
    else:
        dudx, dvdx, dudy, dvdy = duv
        width = jnp.maximum(
            jnp.maximum(jnp.abs(uvm[..., 0] * dudx),
                        jnp.abs(uvm[..., 1] * dvdx)),
            jnp.maximum(jnp.abs(uvm[..., 0] * dudy),
                        jnp.abs(uvm[..., 1] * dvdy)))

    const_v = scene.txd_rgb0[safe]
    parity = (jnp.floor(st[..., 0]) + jnp.floor(st[..., 1])) % 2.0
    checker_v = jnp.where((parity == 0.0)[..., None],
                          scene.txd_rgb0[safe], scene.txd_rgb1[safe])
    img_v = pool_lookup(scene.tex, scene.txd_image[safe], st, width)
    img_v = jnp.where(scene.txd_srgb[safe][..., None],
                      pm.inverse_gamma_correct(img_v), img_v)
    img_v = img_v * scene.txd_scale[safe]
    ch = scene.txd_channel[safe]
    ch_v = jnp.take_along_axis(
        img_v, jnp.maximum(ch, 0)[..., None], axis=-1)
    img_v = jnp.where((ch >= 0)[..., None],
                      jnp.broadcast_to(ch_v, img_v.shape), img_v)

    val = jnp.select([(kind == 1)[..., None], (kind == 2)[..., None]],
                     [checker_v, img_v], const_v)
    return jnp.where((txd_id >= 0)[..., None], val, fallback)


# ---------------------------------------------------------------- materials
def gather_params(scene, mat_id, uv=None, mat_attr=None, has_tex=True,
                  duv=None, tex_channels=None):
    """Per-ray material parameter gather from the packed material table.

    mat_attr: (M, MA_WIDTH) packed rows (TracedScene.mat_attr); built on
    the fly from SceneData when omitted (test convenience). With uv given
    AND has_tex, texture-bound parameters (kd/ks/metallic/roughness)
    evaluate their descriptors (compute_scattering_functions texture evals,
    material/*.rs); texture-free scenes compile all of that out.
    """
    from ..scene.scene import (MA_ETA, MA_K, MA_KD, MA_KS, MA_MISC,
                               MA_REMAP, MA_ROUGH, MA_TYPE, pack_mat_attr)
    from .gather import take_rows
    if mat_attr is None:
        mat_attr = pack_mat_attr(scene)
    rows = take_rows(mat_attr, mat_id)
    rough = rows[:, MA_ROUGH]
    ax_raw, ay_raw = rough[:, 0], rough[:, 1]
    remap = rows[:, MA_REMAP] > 0.5
    ax = jnp.where(remap, roughness_to_alpha(ax_raw), ax_raw)
    ay = jnp.where(remap, roughness_to_alpha(ay_raw), ay_raw)
    mtype = rows[:, MA_TYPE].astype(jnp.int32)
    # Disney derives its own alphas: max(0.001, roughness^2) (disney.rs:220-222)
    kd = rows[:, MA_KD]
    ks = rows[:, MA_KS]
    misc = rows[:, MA_MISC]
    metallic = misc[:, 0]
    rough_d = misc[:, 1]
    if uv is not None and has_tex:
        # per-channel static gating (TracedScene.tex_channels): channels
        # no used material binds skip their eval_texture entirely — each
        # is 4-8 texel gathers per lane on the gather-rate-bound hot path
        ck, cs, cm, cr = (tex_channels if tex_channels is not None
                          else (True,) * 4)
        if ck:
            kd = eval_texture(scene, scene.mat_kd_tx[mat_id], uv, kd,
                              duv=duv)
        if cs:
            ks = eval_texture(scene, scene.mat_ks_tx[mat_id], uv, ks,
                              duv=duv)
        if cm:
            metallic = eval_texture(
                scene, scene.mat_metallic_tx[mat_id], uv,
                metallic[..., None] * jnp.ones(3), duv=duv)[..., 0]
        if cr:
            rough_d = eval_texture(
                scene, scene.mat_rough_tx[mat_id], uv,
                rough_d[..., None] * jnp.ones(3), duv=duv)[..., 0]
    alpha_d = jnp.maximum(0.001, rough_d * rough_d)
    ax = jnp.where(mtype == MAT_DISNEY, alpha_d, jnp.maximum(ax, 0.001))
    ay = jnp.where(mtype == MAT_DISNEY, alpha_d, jnp.maximum(ay, 0.001))
    return dict(
        mtype=mtype,
        kd=kd,
        ks=ks,
        eta3=rows[:, MA_ETA],
        eta=rows[:, MA_ETA][:, 0],
        k=rows[:, MA_K],
        ax=ax, ay=ay,
        metallic=metallic,
    )


def _disney_lobes(mp):
    """Derived Disney quantities (disney.rs:172-240, supported subset)."""
    c = mp["kd"]
    metallic = mp["metallic"]
    lum = pm.luminance(c)
    c_tint = jnp.where((lum > 0.0)[..., None],
                       c / jnp.maximum(lum, 1e-20)[..., None], 1.0)
    diffuse_weight = 1.0 - metallic
    r0 = ((mp["eta"] - 1.0) ** 2 / (mp["eta"] + 1.0) ** 2)[..., None]
    c_spec0 = pm.lerp(r0 * jnp.ones_like(c), c, metallic[..., None])
    return diffuse_weight[..., None] * c, c_spec0


def _microfacet_f(r, wo, wi, ax, ay, fresnel_fn, separable=None):
    """Torrance-Sparrow reflection f (ref microfacet.rs:197-212)."""
    cto = abs_cos_theta(wo)
    cti = abs_cos_theta(wi)
    wh = wi + wo
    wh_ok = pm.norm_sq(wh) > 0.0
    whn = pm.normalize(wh)
    fr = fresnel_fn(pm.dot(wi, whn))
    val = r * tr_d(whn, ax, ay)[..., None] * \
        tr_g(wo, wi, ax, ay, separable)[..., None] * fr / \
        jnp.maximum(4.0 * cti * cto, 1e-20)[..., None]
    ok = wh_ok & (cti > 0.0) & (cto > 0.0)
    return jnp.where(ok[..., None], val, 0.0)


def _microfacet_pdf(wo, wi, ax, ay):
    """(ref microfacet.rs:245-251) — zero when not same hemisphere."""
    wh = pm.normalize(wo + wi)
    pdf = tr_pdf(wo, wh, ax, ay) / jnp.maximum(4.0 * pm.dot(wo, wh), 1e-20)
    return jnp.where(same_hemisphere(wo, wi), pdf, 0.0)


def _mf_trans_f(t, wo, wi, ax, ay, eta_b):
    """MicrofacetTransmission f (ref microfacet.rs:283-327), radiance mode.

    eta_b: interior IOR (eta_a = 1). NOTE: the reference's own pdf()
    (:362-383) inverts both the hemisphere test and the eta ratio relative
    to its f() — dead code upstream (no material builds this lobe,
    material/mod.rs:216-256), so we implement the consistent PBRT
    semantics: transmission requires OPPOSITE hemispheres and
    eta = eta_b/eta_a when wo is on the outside.
    """
    cto = abs_cos_theta(wo)
    cti = abs_cos_theta(wi)
    eta = jnp.where(cos_theta(wo) > 0.0, eta_b, 1.0 / eta_b)
    wh = wo + wi * eta[..., None]
    wh_ok = pm.norm_sq(wh) > 0.0
    whn = pm.normalize(wh)
    whn = jnp.where((whn[..., 2] < 0.0)[..., None], -whn, whn)
    d_o, d_i = pm.dot(wo, whn), pm.dot(wi, whn)
    fr = fr_dielectric(d_o, jnp.ones_like(eta_b), eta_b)
    sqrt_denom = d_o + eta * d_i
    factor = 1.0 / eta  # TransportMode::Radiance
    val = (1.0 - fr)[..., None] * t * jnp.abs(
        tr_d(whn, ax, ay) * tr_g(wo, wi, ax, ay) * eta * eta *
        jnp.abs(d_i) * jnp.abs(d_o) * factor * factor /
        jnp.maximum(cti * cto * sqrt_denom * sqrt_denom, 1e-20))[..., None]
    ok = ~same_hemisphere(wo, wi) & (cti > 0.0) & (cto > 0.0) & \
        ~(d_o * d_i > 0.0) & wh_ok
    return jnp.where(ok[..., None], val, 0.0)


def _mf_trans_pdf(wo, wi, ax, ay, eta_b):
    """MicrofacetTransmission pdf: tr_pdf(wo, wh) x |dwh/dwi|
    (ref microfacet.rs:362-383, hemisphere/eta corrected — see _mf_trans_f).
    """
    eta = jnp.where(cos_theta(wo) > 0.0, eta_b, 1.0 / eta_b)
    wh_raw = wo + wi * eta[..., None]
    # degenerate half-vector (wo + eta*wi ~ 0): normalize() yields NaN and
    # the ~(d_o*d_i > 0) mask passes on NaN dots — guard like _mf_trans_f
    wh_ok = pm.norm_sq(wh_raw) > 0.0
    wh = pm.normalize(wh_raw)
    d_o, d_i = pm.dot(wo, wh), pm.dot(wi, wh)
    sqrt_denom = d_o + eta * d_i
    dwh_dwi = jnp.abs(eta * eta * d_i /
                      jnp.maximum(sqrt_denom * sqrt_denom, 1e-20))
    pdf = tr_pdf(wo, wh, ax, ay) * dwh_dwi
    ok = wh_ok & ~same_hemisphere(wo, wi) & ~(d_o * d_i > 0.0)
    return jnp.where(ok, pdf, 0.0)


def _fresnel_blend_f(rd, rs, wo, wi, ax, ay):
    """Ashikhmin-Shirley substrate f (ref microfacet.rs:408-427)."""
    def pow5(v):
        return (v * v) * (v * v) * v
    diffuse = (28.0 / (23.0 * np.pi)) * rd * (1.0 - rs) * \
        (1.0 - pow5(1.0 - 0.5 * abs_cos_theta(wi)))[..., None] * \
        (1.0 - pow5(1.0 - 0.5 * abs_cos_theta(wo)))[..., None]
    wh = wi + wo
    wh_ok = pm.norm_sq(wh) > 0.0
    whn = pm.normalize(wh)
    schlick = rs + pow5(1.0 - pm.dot(wi, whn))[..., None] * (1.0 - rs)
    spec = (tr_d(whn, ax, ay) /
            jnp.maximum(4.0 * jnp.abs(pm.dot(wi, whn)) *
                        jnp.maximum(abs_cos_theta(wi), abs_cos_theta(wo)),
                        1e-20))[..., None] * schlick
    return jnp.where(wh_ok[..., None], diffuse + spec, 0.0)


def _fresnel_blend_pdf(wo, wi, ax, ay):
    """(ref microfacet.rs:461-469)."""
    wh = pm.normalize(wo + wi)
    pdf_wh = tr_pdf(wo, wh, ax, ay)
    pdf = 0.5 * (abs_cos_theta(wi) * INV_PI +
                 pdf_wh / jnp.maximum(4.0 * pm.dot(wo, wh), 1e-20))
    return jnp.where(same_hemisphere(wo, wi), pdf, 0.0)


def _disney_diffuse_f(r, wo, wi):
    """Burley diffuse (ref disney.rs:84-91)."""
    fo = schlick_weight(abs_cos_theta(wo))
    fi = schlick_weight(abs_cos_theta(wi))
    return r * INV_PI * ((1.0 - fo / 2.0) * (1.0 - fi / 2.0))[..., None]


def _cosine_pdf(wo, wi):
    return jnp.where(same_hemisphere(wo, wi),
                     abs_cos_theta(wi) * INV_PI, 0.0)


def eval_f_pdf(mp, wo, wi, reflect_ng, present=None):
    """BSDF f and pdf for NEE's light branch, flags = ALL − SPECULAR.

    wo, wi local; reflect_ng: (N,) bool — (wi·ng)(wo·ng) > 0 computed in
    world space by the caller (ref bsdf.rs:150-187 hemisphere routing).
    Specular materials (mirror/glass) return f=0, pdf=0. `present` is the
    static set of material types in the scene: absent models compile to
    nothing (scene-adaptive specialization).
    """
    mtype = mp["mtype"]
    ax, ay = mp["ax"], mp["ay"]
    wo_ok = wo[..., 2] != 0.0
    if present is None:
        present = (MAT_MATTE, MAT_MIRROR, MAT_GLASS, MAT_METAL,
                   MAT_SUBSTRATE, MAT_DISNEY, MAT_ROUGHGLASS)

    preds, fs, pdfs = [], [], []

    if MAT_MATTE in present:
        preds.append(mtype == MAT_MATTE)
        fs.append(mp["kd"] * INV_PI)
        pdfs.append(_cosine_pdf(wo, wi))

    if MAT_METAL in present:
        preds.append(mtype == MAT_METAL)
        fs.append(_microfacet_f(
            mp["ks"], wo, wi, ax, ay,
            lambda ci: fr_conductor(jnp.abs(ci), jnp.ones_like(mp["eta3"]),
                                    mp["eta3"], mp["k"])))
        pdfs.append(_microfacet_pdf(wo, wi, ax, ay))

    if MAT_SUBSTRATE in present:
        preds.append(mtype == MAT_SUBSTRATE)
        fs.append(_fresnel_blend_f(mp["kd"], mp["ks"], wo, wi, ax, ay))
        pdfs.append(_fresnel_blend_pdf(wo, wi, ax, ay))

    if MAT_DISNEY in present:
        dif_c, c_spec0 = _disney_lobes(mp)
        sep = jnp.ones_like(mp["eta"], bool)
        preds.append(mtype == MAT_DISNEY)
        fs.append(_disney_diffuse_f(dif_c, wo, wi) + _microfacet_f(
            jnp.ones_like(dif_c), wo, wi, ax, ay,
            lambda ci: disney_fresnel(c_spec0, mp["metallic"], mp["eta"], ci),
            separable=sep))
        pdfs.append(0.5 * (_cosine_pdf(wo, wi)
                           + _microfacet_pdf(wo, wi, ax, ay)))

    if MAT_ROUGHGLASS in present:
        # glossy dielectric: MicrofacetReflection(kd=Kr, Dielectric) +
        # MicrofacetTransmission(ks=Kt). The ng hemisphere test routes f
        # to the matching lobe (bsdf.rs:172-186); pdf averages both
        # matching components (bsdf.rs:189-222).
        eta_b = mp["eta"]
        f_refl = _microfacet_f(
            mp["kd"], wo, wi, ax, ay,
            lambda ci: fr_dielectric(ci, jnp.ones_like(eta_b),
                                     eta_b)[..., None])
        f_trans = _mf_trans_f(mp["ks"], wo, wi, ax, ay, eta_b)
        preds.append(mtype == MAT_ROUGHGLASS)
        fs.append(jnp.where(reflect_ng[..., None], f_refl, f_trans))
        pdfs.append(0.5 * (_microfacet_pdf(wo, wi, ax, ay)
                           + _mf_trans_pdf(wo, wi, ax, ay, eta_b)))

    zero3 = jnp.zeros(wo.shape[:-1] + (3,), jnp.float32)
    zero1 = jnp.zeros(wo.shape[:-1], jnp.float32)
    if not preds:
        return zero3, zero1
    sel3 = [p[..., None] for p in preds]
    f = jnp.select(sel3, fs, zero3) if len(fs) > 1 else \
        jnp.where(sel3[0], fs[0], zero3)
    pdf = jnp.select(preds, pdfs, zero1) if len(pdfs) > 1 else \
        jnp.where(preds[0], pdfs[0], zero1)

    # every lobe above except roughglass-transmission is REFLECTION-type:
    # zero f unless the ng-test agrees (ref bsdf.rs:172-186); roughglass
    # already routed f by reflect_ng above
    allow = reflect_ng
    if MAT_ROUGHGLASS in present:
        allow = allow | (mtype == MAT_ROUGHGLASS)
    f = jnp.where((allow & wo_ok)[..., None], f, 0.0)
    pdf = jnp.where(wo_ok, pdf, 0.0)
    return f, pdf


def has_nonspecular(mtype):
    """Materials with at least one non-specular lobe (NEE applies)."""
    return (mtype != MAT_MIRROR) & (mtype != MAT_GLASS)


def sample_f(mp, wo, u, reflect_ng_fn, present=None):
    """Sample the BSDF, flags = ALL (path bounce, ref bsdf.rs:66-148).

    mp: material params; wo: local outgoing; u: (N, 2) in [0,1);
    reflect_ng_fn: callable wi_local → (N,) bool reflect test via geometric
    normal in world space (needed for Disney's multi-lobe f re-evaluation).
    `present` is the static set of material types in the scene — absent
    models compile to nothing. Returns dict(wi, f, pdf, specular,
    transmission).
    """
    mtype = mp["mtype"]
    ax, ay = mp["ax"], mp["ay"]
    u0, u1 = u[..., 0], u[..., 1]
    if present is None:
        present = (MAT_MATTE, MAT_MIRROR, MAT_GLASS, MAT_METAL,
                   MAT_SUBSTRATE, MAT_DISNEY, MAT_ROUGHGLASS)

    preds, wis, fs, pdfs = [], [], [], []
    glass_trans = jnp.zeros(u0.shape, bool)

    if MAT_MATTE in present:
        # ---- matte: cosine hemisphere (bxdf/mod.rs:103-121)
        wi_matte = cosine_sample_hemisphere(u)
        wi_matte = jnp.where((wo[..., 2] < 0.0)[..., None],
                             wi_matte * jnp.asarray([1.0, 1.0, -1.0]),
                             wi_matte)
        preds.append(mtype == MAT_MATTE)
        wis.append(wi_matte)
        fs.append(mp["kd"] * INV_PI)
        pdfs.append(_cosine_pdf(wo, wi_matte))

    if MAT_MIRROR in present:
        # ---- mirror (fresnel.rs:129-140): fresnel NoOp = 1
        wi_mirror = reflect_local(wo)
        preds.append(mtype == MAT_MIRROR)
        wis.append(wi_mirror)
        fs.append(jnp.ones_like(mp["kd"]) /
                  jnp.maximum(abs_cos_theta(wi_mirror), 1e-20)[..., None])
        pdfs.append(jnp.ones_like(u0))

    if MAT_GLASS in present:
        # ---- glass: FresnelSpecular (fresnel.rs:244-288)
        eta_a = jnp.ones_like(mp["eta"])
        eta_b = mp["eta"]
        fr = fr_dielectric(cos_theta(wo), eta_a, eta_b)
        take_refl = u0 < fr
        wi_gr = reflect_local(wo)
        f_gr = fr[..., None] * mp["kd"] / \
            jnp.maximum(abs_cos_theta(wi_gr), 1e-20)[..., None]
        entering = cos_theta(wo) > 0.0
        ei = jnp.where(entering, eta_a, eta_b)
        et = jnp.where(entering, eta_b, eta_a)
        n_ff = jnp.stack([jnp.zeros_like(u0), jnp.zeros_like(u0),
                          jnp.where(entering, 1.0, -1.0)], axis=-1)
        wi_gt, refr_ok = refract(wo, n_ff, ei / et)
        ft = mp["ks"] * (1.0 - fr)[..., None] * \
            ((ei * ei) / (et * et))[..., None] / \
            jnp.maximum(abs_cos_theta(wi_gt), 1e-20)[..., None]
        f_gt = jnp.where(refr_ok[..., None], ft, 0.0)
        preds.append(mtype == MAT_GLASS)
        wis.append(jnp.where(take_refl[..., None], wi_gr, wi_gt))
        fs.append(jnp.where(take_refl[..., None], f_gr, f_gt))
        pdfs.append(jnp.where(take_refl, fr, 1.0 - fr))
        glass_trans = (mtype == MAT_GLASS) & ~take_refl

    if MAT_METAL in present:
        # ---- metal: sample visible normal, reflect (microfacet.rs:218-243)
        wh_m = tr_sample_wh(wo, u, ax, ay)
        wi_metal = reflect_about(wo, wh_m)
        metal_ok = (wo[..., 2] != 0.0) & (pm.dot(wo, wh_m) >= 0.0) & \
            same_hemisphere(wo, wi_metal)
        preds.append(mtype == MAT_METAL)
        wis.append(wi_metal)
        pdfs.append(jnp.where(
            metal_ok,
            tr_pdf(wo, wh_m, ax, ay) /
            jnp.maximum(4.0 * pm.dot(wo, wh_m), 1e-20),
            0.0))
        fs.append(jnp.where(metal_ok[..., None], _microfacet_f(
            mp["ks"], wo, wi_metal, ax, ay,
            lambda ci: fr_conductor(jnp.abs(ci), jnp.ones_like(mp["eta3"]),
                                    mp["eta3"], mp["k"])), 0.0))

    if MAT_SUBSTRATE in present:
        # ---- substrate: FresnelBlend sample (microfacet.rs:433-459)
        half = u0 < 0.5
        u0_s = jnp.where(half, jnp.minimum(2.0 * u0, ONE_MINUS_EPSILON),
                         jnp.minimum(2.0 * (u0 - 0.5), ONE_MINUS_EPSILON))
        us = jnp.stack([u0_s, u1], axis=-1)
        wi_s_cos = cosine_sample_hemisphere(us)
        wi_s_cos = jnp.where((wo[..., 2] < 0.0)[..., None],
                             wi_s_cos * jnp.asarray([1.0, 1.0, -1.0]),
                             wi_s_cos)
        wh_s = tr_sample_wh(wo, us, ax, ay)
        wi_s_spec = reflect_about(wo, wh_s)
        wi_sub = jnp.where(half[..., None], wi_s_cos, wi_s_spec)
        sub_ok = half | same_hemisphere(wo, wi_sub)
        preds.append(mtype == MAT_SUBSTRATE)
        wis.append(wi_sub)
        pdfs.append(jnp.where(sub_ok,
                              _fresnel_blend_pdf(wo, wi_sub, ax, ay), 0.0))
        fs.append(jnp.where(
            sub_ok[..., None],
            _fresnel_blend_f(mp["kd"], mp["ks"], wo, wi_sub, ax, ay), 0.0))

    if MAT_DISNEY in present:
        # ---- disney: uniform pick of 2 lobes + remap (bsdf.rs:83-147)
        comp = jnp.minimum(jnp.floor(u0 * 2.0), 1.0)
        u0_d = u0 * 2.0 - comp
        ud = jnp.stack([u0_d, u1], axis=-1)
        take_diff = comp == 0.0
        wi_d_cos = cosine_sample_hemisphere(ud)
        wi_d_cos = jnp.where((wo[..., 2] < 0.0)[..., None],
                             wi_d_cos * jnp.asarray([1.0, 1.0, -1.0]),
                             wi_d_cos)
        wh_d = tr_sample_wh(wo, ud, ax, ay)
        wi_d_spec = reflect_about(wo, wh_d)
        spec_ok = (wo[..., 2] != 0.0) & (pm.dot(wo, wh_d) >= 0.0)
        wi_dis = jnp.where(take_diff[..., None], wi_d_cos, wi_d_spec)
        dif_c, c_spec0 = _disney_lobes(mp)
        sep = jnp.ones_like(mp["eta"], bool)
        # summed pdf over both lobes / 2 (bsdf.rs:117-127)
        pdf_dis = 0.5 * (_cosine_pdf(wo, wi_dis) +
                         _microfacet_pdf(wo, wi_dis, ax, ay))
        pdf_dis = jnp.where(take_diff | spec_ok, pdf_dis, 0.0)
        # f re-evaluated over both lobes with ng hemisphere routing
        reflect_ng_dis = reflect_ng_fn(wi_dis)
        f_dis = _disney_diffuse_f(dif_c, wo, wi_dis) + _microfacet_f(
            jnp.ones_like(dif_c), wo, wi_dis, ax, ay,
            lambda ci: disney_fresnel(c_spec0, mp["metallic"], mp["eta"], ci),
            separable=sep)
        f_dis = jnp.where((reflect_ng_dis & (take_diff | spec_ok))[..., None],
                          f_dis, 0.0)
        preds.append(mtype == MAT_DISNEY)
        wis.append(wi_dis)
        fs.append(f_dis)
        pdfs.append(pdf_dis)

    rough_trans = jnp.zeros(u0.shape, bool)
    if MAT_ROUGHGLASS in present:
        # ---- rough glass: uniform pick of {MicrofacetReflection,
        # MicrofacetTransmission} + u0 remap (bsdf.rs:83-115), then f/pdf
        # re-evaluated over both lobes (bsdf.rs:117-147)
        eta_b = mp["eta"]
        take_refl = u0 < 0.5
        u0_g = jnp.where(take_refl,
                         jnp.minimum(2.0 * u0, ONE_MINUS_EPSILON),
                         jnp.minimum(2.0 * (u0 - 0.5), ONE_MINUS_EPSILON))
        ug = jnp.stack([u0_g, u1], axis=-1)
        wh_g = tr_sample_wh(wo, ug, ax, ay)
        wh_valid = pm.dot(wo, wh_g) >= 0.0  # microfacet.rs:224-226,346-348
        wi_gr = reflect_about(wo, wh_g)
        # refract about wh faceforwarded to wo's side (microfacet.rs:350-356)
        entering = cos_theta(wo) > 0.0
        eta_ratio = jnp.where(entering, 1.0 / eta_b, eta_b)  # ei/et
        wh_ff = jnp.where((pm.dot(wo, wh_g) < 0.0)[..., None], -wh_g, wh_g)
        wi_gt, refr_ok = refract(wo, wh_ff, eta_ratio)
        wi_rg = jnp.where(take_refl[..., None], wi_gr, wi_gt)
        lobe_ok = wh_valid & (wo[..., 2] != 0.0) & \
            jnp.where(take_refl, same_hemisphere(wo, wi_gr), refr_ok)
        f_refl = _microfacet_f(
            mp["kd"], wo, wi_rg, ax, ay,
            lambda ci: fr_dielectric(ci, jnp.ones_like(eta_b),
                                     eta_b)[..., None])
        f_trans = _mf_trans_f(mp["ks"], wo, wi_rg, ax, ay, eta_b)
        reflect_ng_rg = reflect_ng_fn(wi_rg)
        f_rg = jnp.where(reflect_ng_rg[..., None], f_refl, f_trans)
        pdf_rg = 0.5 * (_microfacet_pdf(wo, wi_rg, ax, ay)
                        + _mf_trans_pdf(wo, wi_rg, ax, ay, eta_b))
        preds.append(mtype == MAT_ROUGHGLASS)
        wis.append(wi_rg)
        fs.append(jnp.where(lobe_ok[..., None], f_rg, 0.0))
        pdfs.append(jnp.where(lobe_ok, pdf_rg, 0.0))
        rough_trans = (mtype == MAT_ROUGHGLASS) & ~reflect_ng_rg

    zero3 = jnp.zeros(wo.shape[:-1] + (3,), jnp.float32)
    zero1 = jnp.zeros(wo.shape[:-1], jnp.float32)
    default_wi = wis[0] if wis else jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0]), wo.shape)
    if len(preds) > 1:
        sel3 = [p[..., None] for p in preds]
        wi = jnp.select(sel3, wis, default_wi)
        f = jnp.select(sel3, fs, zero3)
        pdf = jnp.select(preds, pdfs, zero1)
    elif preds:
        wi = jnp.where(preds[0][..., None], wis[0], default_wi)
        f = jnp.where(preds[0][..., None], fs[0], zero3)
        pdf = jnp.where(preds[0], pdfs[0], zero1)
    else:
        wi, f, pdf = default_wi, zero3, zero1
    specular = (mtype == MAT_MIRROR) | (mtype == MAT_GLASS)
    transmission = glass_trans | rough_trans
    return dict(wi=wi, f=f, pdf=pdf, specular=specular,
                transmission=transmission)
