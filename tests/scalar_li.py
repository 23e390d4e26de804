"""Scalar per-path transcription of the reference integrator.

Independent cross-validation oracle for the wavefront integrator: a direct
python transcription of the REFERENCE code paths — recursive control flow,
per-path branches, same formulas — not of the repo's vectorized code:

- li() bounce loop             integrator.rs:392-503
- uniform_sample_one_light     integrator.rs:192-217
- estimate_direct (dual MIS)   integrator.rs:23-139
- watertight triangle test     shape.rs:74-184
- interaction + shading frame  shape.rs:187-356, bsdf.rs:20-64
- lambertian + cosine sampling bxdf/mod.rs:103-231, sampling.rs:84-126
- area light sample/pdf        light.rs:231-319, shape.rs:50-72,541-578
- robust offsets               math.rs:8-10,107-131

The ONLY deliberate deviation mirrored from the wavefront integrator is the
sampler dimension layout: static 8-dim slots per bounce (see
integrator.py docstring) instead of the reference's adaptive counters, so
both consume identical Sobol values per decision. All math is np.float32.

Scope (round 3): matte + mirror (SpecularReflection/FresnelNoOp,
material/mod.rs:181-195) + glass (FresnelSpecular, fresnel.rs:215-293,
material/mod.rs:216-235) + GGX metal (MicrofacetReflection +
FresnelConductor + TrowbridgeReitz visible-normal sampling,
microfacet.rs:32-252, material/metal.rs:55-93) + SUBSTRATE
(FresnelBlend, microfacet.rs:408-469) + DISNEY subset (DisneyDiffuse +
DisneyFresnel microfacet with separable Smith G and the 2-lobe
sample_f remap, disney.rs:84-170, bsdf.rs:83-147) + ROUGHGLASS
(MicrofacetReflection + MicrofacetTransmission with ng lobe routing,
microfacet.rs:176-384); area + point + distant lights (light.rs:86-230) + the infinite env light (2D-CDF
importance sampling + pdf_li + le, light.rs:401-498,
sampling.rs:128-184). EVERY material class the framework ships is
cross-validated per-path against this scalar oracle.
"""

import numpy as np

F = np.float32
INV_PI = F(1.0 / np.pi)
ONE_MINUS_EPSILON = F(np.nextafter(F(1.0), F(0.0)))
MACHINE_EPSILON = F(np.finfo(np.float32).eps * 0.5)


def gamma(n):  # math.rs:8-10
    n = F(n)
    return (n * MACHINE_EPSILON) / (F(1.0) - n * MACHINE_EPSILON)


GAMMA2, GAMMA3, GAMMA5, GAMMA6, GAMMA7 = (gamma(k) for k in (2, 3, 5, 6, 7))


def v3(x, y=None, z=None):
    if y is None:
        return np.asarray(x, np.float32).copy()
    return np.array([x, y, z], np.float32)


def dot(a, b):
    return F(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])


def cross(a, b):
    return v3(a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
              a[0] * b[1] - a[1] * b[0])


def normalize(v):
    return (v / max(np.sqrt(dot(v, v)), F(1e-20))).astype(np.float32)


def face_forward(n, v):  # math.rs:37-46
    return -n if dot(n, v) < 0.0 else n


def coordinate_system(v1):  # math.rs:48-61
    if abs(v1[0]) > abs(v1[1]):
        inv = F(1.0) / np.sqrt(F(v1[0] * v1[0] + v1[2] * v1[2]))
        v2 = v3(-v1[2] * inv, 0.0, v1[0] * inv)
    else:
        inv = F(1.0) / np.sqrt(F(v1[1] * v1[1] + v1[2] * v1[2]))
        v2 = v3(0.0, v1[2] * inv, -v1[1] * inv)
    return v2, cross(v1, v2)


def next_float_up(v):  # math.rs (bit step toward +inf)
    u = np.float32(v).view(np.uint32) if hasattr(v, "view") else \
        np.float32(v).reshape(()).view(np.uint32)
    v = np.float32(v)
    if np.isinf(v) and v > 0:
        return v
    if v == np.float32(-0.0):
        v = np.float32(0.0)
    u = v.reshape(()).view(np.uint32)
    u = u + 1 if v >= 0 else u - 1
    return u.reshape(()).view(np.float32)[()]


def next_float_down(v):
    v = np.float32(v)
    if np.isinf(v) and v < 0:
        return v
    if v == np.float32(0.0):
        v = np.float32(-0.0)
    u = v.reshape(()).view(np.uint32)
    u = u - 1 if v > 0 else u + 1
    return u.reshape(()).view(np.float32)[()]


def offset_ray_origin(p, p_error, n, w):  # math.rs:107-131
    d = dot(np.abs(n), p_error)
    offset = (d * n).astype(np.float32)
    if dot(w, n) < 0.0:
        offset = -offset
    po = (p + offset).astype(np.float32)
    for i in range(3):
        if offset[i] > 0:
            po[i] = next_float_up(po[i])
        elif offset[i] < 0:
            po[i] = next_float_down(po[i])
    return po


def power_heuristic(nf, f_pdf, ng, g_pdf):  # math.rs:167-171
    f = F(nf) * f_pdf
    g = F(ng) * g_pdf
    return F(f * f / max(f * f + g * g, F(1e-30)))


# --------------------------------------------------------------- geometry
def intersect_triangle(o, d, t_max, p0, p1, p2):
    """Watertight test (shape.rs:74-184). Returns (t, b0, b1, b2) or None."""
    ad = np.abs(d)
    if ad[0] > ad[1]:
        kz = 0 if ad[0] > ad[2] else 2
    else:
        kz = 1 if ad[1] > ad[2] else 2
    kx = 0 if kz == 2 else kz + 1
    ky = 0 if kx == 2 else kx + 1
    dp = v3(d[kx], d[ky], d[kz])
    sx = F(-dp[0] / dp[2])
    sy = F(-dp[1] / dp[2])
    sz = F(1.0 / dp[2])

    def shear(p):
        t = (p - o).astype(np.float32)
        tx = F(t[kx] + sx * t[kz])
        ty = F(t[ky] + sy * t[kz])
        return tx, ty, F(t[kz])

    p0x, p0y, p0z = shear(p0)
    p1x, p1y, p1z = shear(p1)
    p2x, p2y, p2z = shear(p2)
    e0 = F(p1x * p2y - p1y * p2x)
    e1 = F(p2x * p0y - p2y * p0x)
    e2 = F(p0x * p1y - p0y * p1x)
    if (e0 < 0 or e1 < 0 or e2 < 0) and (e0 > 0 or e1 > 0 or e2 > 0):
        return None
    det = F(e0 + e1 + e2)
    if det == 0.0:
        return None
    p0z = F(p0z * sz)
    p1z = F(p1z * sz)
    p2z = F(p2z * sz)
    t_scaled = F(e0 * p0z + e1 * p1z + e2 * p2z)
    if det < 0 and (t_scaled >= 0 or t_scaled < t_max * det):
        return None
    if det > 0 and (t_scaled <= 0 or t_scaled > t_max * det):
        return None
    inv_det = F(1.0 / det)
    t = F(t_scaled * inv_det)
    max_zt = F(np.abs(v3(p0z, p1z, p2z)).max())
    max_xt = F(np.abs(v3(p0x, p1x, p2x)).max())
    max_yt = F(np.abs(v3(p0y, p1y, p2y)).max())
    delta_z = F(GAMMA3 * max_zt)
    delta_x = F(GAMMA5 * (max_xt + max_zt))
    delta_y = F(GAMMA5 * (max_yt + max_zt))
    delta_e = F(2.0 * (GAMMA2 * max_xt * max_yt + delta_y * max_xt
                       + delta_x * max_yt))
    max_e = F(np.abs(v3(e0, e1, e2)).max())
    delta_t = F(3.0 * (GAMMA3 * max_e * max_zt + delta_e * max_zt
                       + delta_z * max_e) * abs(inv_det))
    if t <= delta_t:
        return None
    return t, F(e0 * inv_det), F(e1 * inv_det), F(e2 * inv_det)


class HostScene:
    """Numpy copy of SceneData for per-path scalar tracing."""

    def __init__(self, sd):
        for name in ("p0", "p1", "p2", "n0", "n1", "n2", "uv0", "uv1",
                     "uv2", "material_id", "area_light_id", "light_emit",
                     "light_tri", "light_type", "mat_kd", "mat_type",
                     "mat_ks", "mat_eta", "mat_k", "mat_rough", "mat_remap",
                     "mat_misc",
                     "light_vec", "env_map", "env_cond_func", "env_cond_cdf",
                     "env_cond_int", "env_marg_func", "env_marg_cdf",
                     "env_to_world", "world_to_env"):
            setattr(self, name, np.asarray(getattr(sd, name)))
        self.has_normals = np.asarray(sd.has_normals)
        self.n_lights = int(np.asarray(sd.n_lights))
        self.env_marg_int = F(np.asarray(sd.env_marg_int))
        self.world_radius = F(np.asarray(sd.world_radius))
        self.has_env = bool(np.asarray(sd.has_env))

    def intersect(self, o, d, t_max=np.inf):
        """Closest hit (brute). Returns (tri, t, b) or None."""
        best = None
        t_best = F(t_max)
        for f in range(len(self.p0)):
            r = intersect_triangle(o, d, t_best, self.p0[f], self.p1[f],
                                   self.p2[f])
            if r is not None and r[0] < t_best:
                t_best = r[0]
                best = (f, r[0], (r[1], r[2], r[3]))
        return best

    def intersect_p(self, o, d, t_max):
        for f in range(len(self.p0)):
            if intersect_triangle(o, d, F(t_max), self.p0[f], self.p1[f],
                                  self.p2[f]) is not None:
                return True
        return False


def make_interaction(hs, f, b, wo_dir):
    """shape.rs:187-356 + bsdf frame (bsdf.rs:20-33)."""
    b0, b1, b2 = (F(x) for x in b)
    p0, p1, p2 = hs.p0[f], hs.p1[f], hs.p2[f]
    uv0, uv1, uv2 = hs.uv0[f], hs.uv1[f], hs.uv2[f]
    p = (b0 * p0 + b1 * p1 + b2 * p2).astype(np.float32)
    uv = (b0 * uv0 + b1 * uv1 + b2 * uv2).astype(np.float32)
    p_error = (GAMMA7 * (np.abs(b0 * p0) + np.abs(b1 * p1)
                         + np.abs(b2 * p2))).astype(np.float32)
    duv02 = (uv0 - uv2).astype(np.float32)
    duv12 = (uv1 - uv2).astype(np.float32)
    dp02 = (p0 - p2).astype(np.float32)
    dp12 = (p1 - p2).astype(np.float32)
    det = F(duv02[0] * duv12[1] - duv02[1] * duv12[0])
    ng_raw = cross(dp02, dp12)
    ng = normalize(ng_raw)
    if abs(det) < 1e-8:
        dpdu, dpdv = coordinate_system(ng)
    else:
        inv = F(1.0 / det)
        dpdu = ((duv12[1] * dp02 - duv02[1] * dp12) * inv).astype(np.float32)
        dpdv = ((-duv12[0] * dp02 + duv02[0] * dp12) * inv).astype(np.float32)
        if dot(cross(dpdu, dpdv), cross(dpdu, dpdv)) == 0.0:
            dpdu, dpdv = coordinate_system(ng)
    if hs.has_normals[f]:
        ns = (b0 * hs.n0[f] + b1 * hs.n1[f] + b2 * hs.n2[f]) \
            .astype(np.float32)
        if dot(ns, ns) > 0.0:
            ns = normalize(ns)
        else:
            ns = ng
        ng = face_forward(ng, ns)
    else:
        ns = ng
    # shading frame (set_shading_geometry + bsdf.rs:20-33)
    ss = normalize(dpdu)
    ts = cross(ss, ns)
    if dot(ts, ts) > 0.0:
        ts = normalize(ts)
        ss = cross(ts, ns)
    else:
        ss, _ = coordinate_system(ns)
    ts = cross(ns, ss)
    return dict(p=p, p_error=p_error, uv=uv, ng=ng, ns=ns, ss=ss, ts=ts,
                material=int(hs.material_id[f]),
                area_light=int(hs.area_light_id[f]), tri=f)


def le(hs, it, w):  # light.rs:252-258 one-sided
    lid = it["area_light"]
    if lid < 0 or dot(it["ng"], w) <= 0.0:
        return v3(0.0, 0.0, 0.0)
    return hs.light_emit[lid].astype(np.float32)


def to_local(it, w):
    return v3(dot(w, it["ss"]), dot(w, it["ts"]), dot(w, it["ns"]))


def to_world(it, w):
    return (w[0] * it["ss"] + w[1] * it["ts"] + w[2] * it["ns"]) \
        .astype(np.float32)


def concentric_sample_disk(u):  # sampling.rs:96-112
    ux = F(2.0 * u[0] - 1.0)
    uy = F(2.0 * u[1] - 1.0)
    if ux == 0.0 and uy == 0.0:
        return F(0.0), F(0.0)
    if abs(ux) > abs(uy):
        r, theta = ux, F(np.pi / 4) * F(uy / ux)
    else:
        r, theta = uy, F(F(np.pi / 2) - F(np.pi / 4) * F(ux / uy))
    return F(r * np.cos(theta)), F(r * np.sin(theta))


def cosine_sample_hemisphere(u):  # sampling.rs:114-120
    x, y = concentric_sample_disk(u)
    z = np.sqrt(max(F(0.0), F(1.0 - x * x - y * y)))
    return v3(x, y, z)


def lambertian_f(kd):  # bxdf/mod.rs:195-231
    return (kd * INV_PI).astype(np.float32)


MAT_MATTE, MAT_MIRROR, MAT_GLASS, MAT_METAL = 0, 1, 2, 3
MAT_SUBSTRATE, MAT_DISNEY, MAT_ROUGHGLASS = 4, 5, 6
LIGHT_AREA, LIGHT_POINT, LIGHT_DISTANT, LIGHT_INFINITE = 0, 1, 2, 3


# ---------------------------------------------------- fresnel (fresnel.rs)
def fr_dielectric(cos_theta_i, eta_i, eta_t):  # fresnel.rs:21-40
    cos_theta_i = F(np.clip(cos_theta_i, -1.0, 1.0))
    if not cos_theta_i > 0.0:
        eta_i, eta_t = eta_t, eta_i
        cos_theta_i = F(abs(cos_theta_i))
    sin_theta_i = F(np.sqrt(max(F(0.0), F(1.0 - cos_theta_i * cos_theta_i))))
    sin_theta_t = F(eta_i / eta_t * sin_theta_i)
    if sin_theta_t >= 1.0:
        return F(1.0)
    cos_theta_t = F(np.sqrt(max(F(0.0), F(1.0 - sin_theta_t * sin_theta_t))))
    r_parl = F((eta_t * cos_theta_i - eta_i * cos_theta_t)
               / (eta_t * cos_theta_i + eta_i * cos_theta_t))
    r_perp = F((eta_i * cos_theta_i - eta_t * cos_theta_t)
               / (eta_i * cos_theta_i + eta_t * cos_theta_t))
    return F((r_parl * r_parl + r_perp * r_perp) / 2.0)


def fr_conductor(cos_theta_i, eta_i, eta_t, k):  # fresnel.rs:42-64
    cos_theta_i = F(np.clip(cos_theta_i, -1.0, 1.0))
    eta = (eta_t / eta_i).astype(np.float32)
    etak = (k / eta_i).astype(np.float32)
    ci2 = F(cos_theta_i * cos_theta_i)
    si2 = F(1.0 - ci2)
    eta2 = (eta * eta).astype(np.float32)
    etak2 = (etak * etak).astype(np.float32)
    t0 = (eta2 - etak2 - si2).astype(np.float32)
    a2b2 = np.sqrt(t0 * t0 + 4.0 * eta2 * etak2).astype(np.float32)
    t1 = (a2b2 + ci2).astype(np.float32)
    a = np.sqrt(0.5 * (a2b2 + t0)).astype(np.float32)
    t2 = (2.0 * cos_theta_i * a).astype(np.float32)
    rs = ((t1 - t2) / (t1 + t2)).astype(np.float32)
    t3 = (ci2 * a2b2 + si2 * si2).astype(np.float32)
    t4 = (t2 * si2).astype(np.float32)
    rp = (rs * (t3 - t4) / (t3 + t4)).astype(np.float32)
    return (0.5 * (rp + rs)).astype(np.float32)


def reflect_vec(wo, n):  # bxdf/mod.rs:69-71
    return (-wo + 2.0 * dot(wo, n) * n).astype(np.float32)


def refract_vec(wi, n, eta):  # bxdf/mod.rs:73-89; None = TIR
    cos_theta_i = dot(n, wi)
    sin_2_theta_i = max(F(0.0), F(1.0 - cos_theta_i * cos_theta_i))
    sin_2_theta_t = F(eta * eta * sin_2_theta_i)
    if sin_2_theta_t > 1.0:
        return None
    cos_theta_t = F(np.sqrt(F(1.0 - sin_2_theta_t)))
    return (eta * -wi + (eta * cos_theta_i - cos_theta_t) * n) \
        .astype(np.float32)


# -------------------------------- trowbridge-reitz GGX (microfacet.rs)
def _trig(w):
    """bxdf/mod.rs:11-63 trig helpers (incl. the ref's sin_phi=1 at pole)."""
    c2t = F(w[2] * w[2])
    s2t = max(F(0.0), F(1.0 - c2t))
    st = F(np.sqrt(s2t))
    if st == 0.0:
        cp, sp = F(1.0), F(1.0)
    else:
        cp = F(np.clip(w[0] / st, -1.0, 1.0))
        sp = F(np.clip(w[1] / st, -1.0, 1.0))
    return c2t, s2t, st, cp, sp


def tr_roughness_to_alpha(roughness):  # microfacet.rs:119-127
    roughness = max(F(roughness), F(1e-3))
    x = F(np.log(roughness))
    return F(1.62142 + 0.819955 * x + 0.1734 * x * x + 0.0171201 * x ** 3
             + 0.000640711 * x ** 4)


def tr_d(wh, ax, ay):  # microfacet.rs:131-146
    c2t, s2t, st, cp, sp = _trig(wh)
    if c2t == 0.0:
        return F(0.0)  # tan_2_theta infinite
    t2t = F(s2t / c2t)
    cos4 = F(c2t * c2t)
    e = F((cp * cp / (ax * ax) + sp * sp / (ay * ay)) * t2t)
    return F(1.0 / (np.pi * ax * ay * cos4 * (1.0 + e) * (1.0 + e)))


def tr_lambda(w, ax, ay):  # microfacet.rs:148-158
    c2t, s2t, st, cp, sp = _trig(w)
    if c2t == 0.0:
        return F(0.0)
    abs_tan_theta = F(abs(st / w[2]))
    alpha = F(np.sqrt(cp * cp * ax * ax + sp * sp * ay * ay))
    a2t2 = F((alpha * abs_tan_theta) * (alpha * abs_tan_theta))
    return F((-1.0 + np.sqrt(1.0 + a2t2)) / 2.0)


def tr_g1(w, ax, ay):
    return F(1.0 / (1.0 + tr_lambda(w, ax, ay)))


def tr_g(wo, wi, ax, ay):
    return F(1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay)))


def tr_sample_11(cos_theta, u1, u2):  # microfacet.rs:32-81
    if cos_theta > 0.9999:
        r = F(np.sqrt(F(u1 / (1.0 - u1))))
        phi = F(6.28318530718 * u2)
        return F(r * np.cos(phi)), F(r * np.sin(phi))
    sin_theta = F(np.sqrt(max(F(0.0), F(1.0 - cos_theta * cos_theta))))
    tan_theta = F(sin_theta / cos_theta)
    alpha = F(1.0 / tan_theta)
    g1 = F(2.0 / (1.0 + np.sqrt(F(1.0 + 1.0 / (alpha * alpha)))))
    a = F(2.0 * u1 / g1 - 1.0)
    tmp = min(F(1.0 / (a * a - 1.0)), F(1e10))
    b = tan_theta
    d = F(np.sqrt(max(F(0.0), F(b * b * tmp * tmp - (a * a - b * b) * tmp))))
    slope_x_1 = F(b * tmp - d)
    slope_x_2 = F(b * tmp + d)
    slope_x = slope_x_1 if (a < 0.0 or slope_x_2 > 1.0 / tan_theta) \
        else slope_x_2
    if u2 > 0.5:
        s, u2 = F(1.0), F(2.0 * (u2 - 0.5))
    else:
        s, u2 = F(-1.0), F(2.0 * (0.5 - u2))
    z = F((u2 * (u2 * (u2 * 0.27385 - 0.73369) + 0.46341))
          / (u2 * (u2 * (u2 * 0.093073 + 0.309420) - 1.0) + 0.597999))
    slope_y = F(s * z * np.sqrt(F(1.0 + slope_x * slope_x)))
    return slope_x, slope_y


def tr_sample_wh(wo, u, ax, ay):  # microfacet.rs:83-104,160-169
    flip = wo[2] < 0.0
    w = (-wo).astype(np.float32) if flip else wo
    wi_str = normalize(v3(ax * w[0], ay * w[1], w[2]))
    _, _, st, cp, sp = _trig(wi_str)
    sx, sy = tr_sample_11(F(wi_str[2]), F(u[0]), F(u[1]))
    tmp = F(cp * sx - sp * sy)
    sy = F(sp * sx + cp * sy)
    sx = tmp
    sx, sy = F(ax * sx), F(ay * sy)
    wh = normalize(v3(-sx, -sy, 1.0))
    return (-wh).astype(np.float32) if flip else wh


def tr_pdf(wo, wh, ax, ay):  # microfacet.rs:171-173 (visible normals)
    return F(tr_d(wh, ax, ay) * tr_g1(wo, ax, ay) * abs(dot(wo, wh))
             / max(abs(F(wo[2])), F(1e-20)))


def mat_alpha(hs, m):
    """alpha_x/alpha_y incl. remap (material/metal.rs:57-80)."""
    ax, ay = F(hs.mat_rough[m][0]), F(hs.mat_rough[m][1])
    if hs.mat_remap[m]:
        ax = tr_roughness_to_alpha(ax)
        ay = tr_roughness_to_alpha(ay)
    return max(ax, F(0.001)), max(ay, F(0.001))


def mf_reflection_f(hs, m, wo, wi):
    """MicrofacetReflection::f (microfacet.rs:197-212), conductor fresnel."""
    cos_o, cos_i = F(abs(wo[2])), F(abs(wi[2]))
    wh = (wi + wo).astype(np.float32)
    if cos_i == 0.0 or cos_o == 0.0:
        return v3(0.0, 0.0, 0.0)
    if wh[0] == 0.0 and wh[1] == 0.0 and wh[2] == 0.0:
        return v3(0.0, 0.0, 0.0)
    wh = normalize(wh)
    ax, ay = mat_alpha(hs, m)
    fr = fr_conductor(abs(dot(wi, wh)), v3(1.0, 1.0, 1.0),
                      hs.mat_eta[m].astype(np.float32),
                      hs.mat_k[m].astype(np.float32))
    r = hs.mat_ks[m].astype(np.float32)
    return (r * tr_d(wh, ax, ay) * tr_g(wo, wi, ax, ay) * fr
            / (4.0 * cos_i * cos_o)).astype(np.float32)


def _schlick_weight(c):
    m = min(max(1.0 - c, 0.0), 1.0)
    return F((m * m) * (m * m) * m)


def disney_params(hs, m):
    """Derived Disney quantities (ref disney.rs:172-240, subset)."""
    c = hs.mat_kd[m].astype(np.float32)
    metallic = F(hs.mat_misc[m][0])
    rough_d = F(hs.mat_misc[m][1])
    alpha = max(F(0.001), F(rough_d * rough_d))
    eta = F(hs.mat_eta[m][0])
    r0 = F((eta - 1.0) ** 2 / (eta + 1.0) ** 2)
    c_spec0 = (r0 * (1.0 - metallic) + c * metallic).astype(np.float32)
    dif_c = ((1.0 - metallic) * c).astype(np.float32)
    return dif_c, c_spec0, metallic, eta, alpha


def disney_fresnel_s(c_spec0, metallic, eta, cos_i):
    """Lerp dielectric<->Schlick by metallic (disney.rs:128-136)."""
    diel = fr_dielectric(F(cos_i), F(1.0), eta)
    schlick = (c_spec0 + (1.0 - c_spec0)
               * _schlick_weight(cos_i)).astype(np.float32)
    return ((1.0 - metallic) * diel + metallic * schlick).astype(np.float32)


def disney_f(hs, m, wo, wi):
    """DisneyDiffuse + MicrofacetReflection(DisneyFresnel, separable G)
    (disney.rs:84-91,139-170)."""
    dif_c, c_spec0, metallic, eta, alpha = disney_params(hs, m)
    fo = _schlick_weight(abs(F(wo[2])))
    fi = _schlick_weight(abs(F(wi[2])))
    f = (dif_c * INV_PI * (1.0 - fo / 2.0)
         * (1.0 - fi / 2.0)).astype(np.float32)
    cos_o, cos_i = F(abs(wo[2])), F(abs(wi[2]))
    wh = (wi + wo).astype(np.float32)
    if cos_i != 0.0 and cos_o != 0.0 and \
            not (wh[0] == 0.0 and wh[1] == 0.0 and wh[2] == 0.0):
        wh = normalize(wh)
        fr = disney_fresnel_s(c_spec0, metallic, eta, dot(wi, wh))
        # Disney uses SEPARABLE Smith G = G1(wo) G1(wi) (disney.rs:159-161)
        g = F(tr_g1(wo, alpha, alpha) * tr_g1(wi, alpha, alpha))
        f = (f + tr_d(wh, alpha, alpha) * g * fr
             / (4.0 * cos_i * cos_o)).astype(np.float32)
    return f


def disney_pdf(hs, m, wo, wi):
    """Average of the two matching lobes' pdfs (bsdf.rs:189-222)."""
    if wo[2] * wi[2] <= 0.0:
        return F(0.0)
    _, _, _, _, alpha = disney_params(hs, m)
    wh = normalize((wo + wi).astype(np.float32))
    return F(0.5 * (abs(F(wi[2])) * INV_PI
                    + tr_pdf(wo, wh, alpha, alpha)
                    / (4.0 * dot(wo, wh))))


def _pow5(v):
    return F((v * v) * (v * v) * v)


def fresnel_blend_f(hs, m, wo, wi):
    """Ashikhmin-Shirley substrate f (ref microfacet.rs:408-427)."""
    rd = hs.mat_kd[m].astype(np.float32)
    rs = hs.mat_ks[m].astype(np.float32)
    ax, ay = mat_alpha(hs, m)
    diffuse = ((28.0 / (23.0 * np.pi)) * rd * (1.0 - rs)
               * (1.0 - _pow5(1.0 - 0.5 * abs(F(wi[2]))))
               * (1.0 - _pow5(1.0 - 0.5 * abs(F(wo[2]))))
               ).astype(np.float32)
    wh = (wi + wo).astype(np.float32)
    if wh[0] == 0.0 and wh[1] == 0.0 and wh[2] == 0.0:
        return v3(0.0, 0.0, 0.0)
    wh = normalize(wh)
    schlick = (rs + _pow5(1.0 - dot(wi, wh)) * (1.0 - rs)) \
        .astype(np.float32)
    spec = (tr_d(wh, ax, ay)
            / (4.0 * abs(dot(wi, wh))
               * max(abs(F(wi[2])), abs(F(wo[2])))) * schlick) \
        .astype(np.float32)
    return (diffuse + spec).astype(np.float32)


def fresnel_blend_pdf(hs, m, wo, wi):
    """(ref microfacet.rs:461-469)."""
    if wo[2] * wi[2] <= 0.0:
        return F(0.0)
    ax, ay = mat_alpha(hs, m)
    wh = normalize((wo + wi).astype(np.float32))
    return F(0.5 * (abs(F(wi[2])) * INV_PI
                    + tr_pdf(wo, wh, ax, ay) / (4.0 * dot(wo, wh))))


def mf_refl_dielectric_f(hs, m, wo, wi):
    """MicrofacetReflection with dielectric fresnel (roughglass Kr lobe,
    microfacet.rs:197-212 + fresnel.rs:21-40)."""
    cos_o, cos_i = F(abs(wo[2])), F(abs(wi[2]))
    wh = (wi + wo).astype(np.float32)
    if cos_i == 0.0 or cos_o == 0.0 or \
            (wh[0] == 0.0 and wh[1] == 0.0 and wh[2] == 0.0):
        return v3(0.0, 0.0, 0.0)
    wh = normalize(wh)
    ax, ay = mat_alpha(hs, m)
    eta_b = F(hs.mat_eta[m][0])
    fr = fr_dielectric(dot(wi, wh), F(1.0), eta_b)
    r = hs.mat_kd[m].astype(np.float32)
    return (r * tr_d(wh, ax, ay) * tr_g(wo, wi, ax, ay) * fr
            / (4.0 * cos_i * cos_o)).astype(np.float32)


def mf_trans_f(hs, m, wo, wi):
    """MicrofacetTransmission f (microfacet.rs:283-327, radiance mode;
    hemisphere/eta per ops/bsdf._mf_trans_f's corrected semantics)."""
    cto, cti = F(abs(wo[2])), F(abs(wi[2]))
    if cti == 0.0 or cto == 0.0 or wo[2] * wi[2] > 0.0:
        return v3(0.0, 0.0, 0.0)
    eta_b = F(hs.mat_eta[m][0])
    eta = eta_b if wo[2] > 0.0 else F(1.0 / eta_b)
    wh = (wo + eta * wi).astype(np.float32)
    if dot(wh, wh) == 0.0:
        return v3(0.0, 0.0, 0.0)
    wh = normalize(wh)
    if wh[2] < 0.0:
        wh = (-wh).astype(np.float32)
    d_o, d_i = dot(wo, wh), dot(wi, wh)
    if d_o * d_i > 0.0:
        return v3(0.0, 0.0, 0.0)
    fr = fr_dielectric(d_o, F(1.0), eta_b)
    sqrt_denom = F(d_o + eta * d_i)
    factor = F(1.0 / eta)
    ax, ay = mat_alpha(hs, m)
    t = hs.mat_ks[m].astype(np.float32)
    val = ((1.0 - fr) * t * abs(
        tr_d(wh, ax, ay) * tr_g(wo, wi, ax, ay) * eta * eta
        * abs(d_i) * abs(d_o) * factor * factor
        / max(cti * cto * sqrt_denom * sqrt_denom, F(1e-20))))
    return val.astype(np.float32)


def mf_trans_pdf(hs, m, wo, wi):
    """tr_pdf(wo, wh) x |dwh/dwi| (microfacet.rs:362-383 corrected)."""
    if wo[2] * wi[2] > 0.0:
        return F(0.0)
    eta_b = F(hs.mat_eta[m][0])
    eta = eta_b if wo[2] > 0.0 else F(1.0 / eta_b)
    wh = (wo + eta * wi).astype(np.float32)
    if dot(wh, wh) == 0.0:
        return F(0.0)
    wh = normalize(wh)
    d_o, d_i = dot(wo, wh), dot(wi, wh)
    if d_o * d_i > 0.0:
        return F(0.0)
    sqrt_denom = F(d_o + eta * d_i)
    ax, ay = mat_alpha(hs, m)
    dwh_dwi = F(abs(eta * eta * d_i)
                / max(sqrt_denom * sqrt_denom, F(1e-20)))
    return F(tr_pdf(wo, wh, ax, ay) * dwh_dwi)


def roughglass_pdf(hs, m, wo, wi):
    """Average over the two matching lobes (bsdf.rs:189-222)."""
    ax, ay = mat_alpha(hs, m)
    refl = F(0.0)
    if wo[2] * wi[2] > 0.0:
        wh = normalize((wo + wi).astype(np.float32))
        refl = F(tr_pdf(wo, wh, ax, ay) / (4.0 * dot(wo, wh)))
    return F(0.5 * (refl + mf_trans_pdf(hs, m, wo, wi)))


def bsdf_has_nonspecular(hs, m):
    """num_components(ALL - SPECULAR) > 0 (integrator.rs:443-447)."""
    return int(hs.mat_type[m]) not in (MAT_MIRROR, MAT_GLASS)


def bsdf_f(hs, it, wo_w, wi_w):
    """bsdf.rs:150-187: hemisphere routing by geometric normal."""
    m = it["material"]
    mt = int(hs.mat_type[m])
    reflect = dot(wi_w, it["ng"]) * dot(wo_w, it["ng"]) > 0.0
    wo = to_local(it, wo_w)
    if wo[2] == 0.0:
        return v3(0.0, 0.0, 0.0)
    if mt == MAT_ROUGHGLASS:
        # ng routes to the reflection OR transmission lobe (bsdf.rs:172-186)
        wi = to_local(it, wi_w)
        return mf_refl_dielectric_f(hs, m, wo, wi) if reflect \
            else mf_trans_f(hs, m, wo, wi)
    if not reflect:
        return v3(0.0, 0.0, 0.0)
    if mt == MAT_MATTE:
        return lambertian_f(hs.mat_kd[m])
    if mt == MAT_METAL:
        return mf_reflection_f(hs, m, wo, to_local(it, wi_w))
    if mt == MAT_DISNEY:
        return disney_f(hs, m, wo, to_local(it, wi_w))
    if mt == MAT_SUBSTRATE:
        return fresnel_blend_f(hs, m, wo, to_local(it, wi_w))
    return v3(0.0, 0.0, 0.0)  # specular-only (mirror/glass): f = 0


def bsdf_pdf(hs, it, wo_w, wi_w):
    m = it["material"]
    mt = int(hs.mat_type[m])
    wo = to_local(it, wo_w)
    wi = to_local(it, wi_w)
    if mt == MAT_MATTE:
        if wo[2] == 0.0 or wo[2] * wi[2] <= 0.0:
            return F(0.0)
        return F(abs(wi[2]) * INV_PI)
    if mt == MAT_METAL:  # microfacet.rs:245-252
        if wo[2] * wi[2] <= 0.0:
            return F(0.0)
        wh = normalize((wo + wi).astype(np.float32))
        ax, ay = mat_alpha(hs, m)
        return F(tr_pdf(wo, wh, ax, ay) / (4.0 * dot(wo, wh)))
    if mt == MAT_DISNEY:
        return disney_pdf(hs, m, wo, wi)
    if mt == MAT_SUBSTRATE:
        return fresnel_blend_pdf(hs, m, wo, wi)
    if mt == MAT_ROUGHGLASS:
        return roughglass_pdf(hs, m, wo, wi)
    return F(0.0)  # specular lobes: pdf = 0


def bsdf_sample_f(hs, it, wo_w, u):
    """BSDF::sample_f (bsdf.rs:66-148) with single-lobe materials:
    u is NOT remapped (matching_comps == 1) and f/pdf come straight from
    the lobe. Returns (f, wi_world, pdf, sampled_specular)."""
    m = it["material"]
    mt = int(hs.mat_type[m])
    wo = to_local(it, wo_w)
    if mt == MAT_MIRROR:
        # SpecularReflection, r=1, FresnelNoOp (material/mod.rs:181-195)
        wi = v3(-wo[0], -wo[1], wo[2])
        if abs(wi[2]) == 0.0:
            return v3(0.0, 0.0, 0.0), to_world(it, wi), F(0.0), True, False
        f = (v3(1.0, 1.0, 1.0) / abs(wi[2])).astype(np.float32)
        return f, to_world(it, wi), F(1.0), True, False
    if mt == MAT_GLASS:
        # FresnelSpecular (fresnel.rs:244-288), kr/kt, eta_a=1, eta_b=ior
        eta_b = F(hs.mat_eta[m][0])
        fr = fr_dielectric(F(wo[2]), F(1.0), eta_b)
        if u[0] < fr:
            wi = v3(-wo[0], -wo[1], wo[2])
            f = (fr * hs.mat_kd[m] / abs(wi[2])).astype(np.float32)
            return f, to_world(it, wi), F(fr), True, False
        entering = wo[2] > 0.0
        eta_i = F(1.0) if entering else eta_b
        eta_t = eta_b if entering else F(1.0)
        n = face_forward(v3(0.0, 0.0, 1.0), wo)
        wi = refract_vec(wo, n, F(eta_i / eta_t))
        if wi is None:
            return v3(0.0, 0.0, 0.0), wo_w, F(0.0), True, True
        ft = (hs.mat_ks[m] * (1.0 - fr)).astype(np.float32)
        ft = (ft * (eta_i * eta_i) / (eta_t * eta_t)).astype(np.float32)
        return (ft / abs(wi[2])).astype(np.float32), to_world(it, wi), \
            F(1.0 - fr), True, True
    if mt == MAT_METAL:
        # MicrofacetReflection::sample_f (microfacet.rs:218-243)
        if wo[2] == 0.0:
            return v3(0.0, 0.0, 0.0), wo_w, F(0.0), False, False
        ax, ay = mat_alpha(hs, m)
        wh = tr_sample_wh(wo, u, ax, ay)
        if dot(wo, wh) < 0.0:
            return v3(0.0, 0.0, 0.0), wo_w, F(0.0), False, False
        wi = reflect_vec(wo, wh)
        if wo[2] * wi[2] <= 0.0:
            return v3(0.0, 0.0, 0.0), to_world(it, wi), F(0.0), False, False
        pdf = F(tr_pdf(wo, wh, ax, ay) / (4.0 * dot(wo, wh)))
        f = mf_reflection_f(hs, m, wo, wi)
        return f, to_world(it, wi), pdf, False, False
    if mt == MAT_DISNEY:
        # two matching lobes: uniform component pick + u0 remap, then
        # f/pdf re-evaluated over BOTH lobes with ng hemisphere routing
        # (bsdf.rs:83-147)
        _, _, _, _, alpha = disney_params(hs, m)
        comp = min(int(u[0] * 2.0), 1)
        ud = (F(u[0] * 2.0 - comp), u[1])
        if comp == 0:
            wi = cosine_sample_hemisphere(ud)
            if wo[2] < 0.0:
                wi[2] = -wi[2]
            lobe_ok = True
        else:
            if wo[2] == 0.0:
                return v3(0.0, 0.0, 0.0), wo_w, F(0.0), False, False
            wh = tr_sample_wh(wo, ud, alpha, alpha)
            if dot(wo, wh) < 0.0:
                return v3(0.0, 0.0, 0.0), wo_w, F(0.0), False, False
            wi = reflect_vec(wo, wh)
            lobe_ok = True
        wi_w = to_world(it, wi)
        pdf = disney_pdf(hs, m, wo, wi) if lobe_ok else F(0.0)
        reflect = dot(wi_w, it["ng"]) * dot(wo_w, it["ng"]) > 0.0
        f = disney_f(hs, m, wo, wi) if (lobe_ok and reflect) \
            else v3(0.0, 0.0, 0.0)
        return f, wi_w, pdf, False, False
    if mt == MAT_ROUGHGLASS:
        # two lobes {MicrofacetReflection, MicrofacetTransmission}:
        # uniform pick + u0 remap, f/pdf re-evaluated over both with ng
        # routing (bsdf.rs:83-147; ops/bsdf.py sample_f roughglass)
        ax, ay = mat_alpha(hs, m)
        eta_b = F(hs.mat_eta[m][0])
        take_refl = u[0] < 0.5
        u0g = F(min(2.0 * u[0], ONE_MINUS_EPSILON)) if take_refl \
            else F(min(2.0 * (u[0] - 0.5), ONE_MINUS_EPSILON))
        wh = tr_sample_wh(wo, (u0g, u[1]), ax, ay)
        if wo[2] == 0.0 or dot(wo, wh) < 0.0:
            return v3(0.0, 0.0, 0.0), wo_w, F(0.0), False, False
        if take_refl:
            wi = reflect_vec(wo, wh)
            if wo[2] * wi[2] <= 0.0:
                return v3(0.0, 0.0, 0.0), to_world(it, wi), F(0.0), \
                    False, False
        else:
            eta_ratio = F(1.0 / eta_b) if wo[2] > 0.0 else eta_b
            wi = refract_vec(wo, wh, eta_ratio)
            if wi is None:
                return v3(0.0, 0.0, 0.0), wo_w, F(0.0), False, True
        wi_w = to_world(it, wi)
        reflect = dot(wi_w, it["ng"]) * dot(wo_w, it["ng"]) > 0.0
        f = mf_refl_dielectric_f(hs, m, wo, wi) if reflect \
            else mf_trans_f(hs, m, wo, wi)
        pdf = roughglass_pdf(hs, m, wo, wi)
        return f, wi_w, pdf, False, not reflect
    if mt == MAT_SUBSTRATE:
        # FresnelBlend sample (microfacet.rs:433-459): half cosine, half
        # visible-normal spec, u0 remapped; ONE component -> no ng
        # recompute (bsdf.rs:118-119)
        ax, ay = mat_alpha(hs, m)
        if u[0] < 0.5:
            us = (F(min(2.0 * u[0], ONE_MINUS_EPSILON)), u[1])
            wi = cosine_sample_hemisphere(us)
            if wo[2] < 0.0:
                wi[2] = -wi[2]
        else:
            us = (F(min(2.0 * (u[0] - 0.5), ONE_MINUS_EPSILON)), u[1])
            wh = tr_sample_wh(wo, us, ax, ay)
            wi = reflect_vec(wo, wh)
            if wo[2] * wi[2] <= 0.0:
                return v3(0.0, 0.0, 0.0), to_world(it, wi), F(0.0), \
                    False, False
        pdf = fresnel_blend_pdf(hs, m, wo, wi)
        f = fresnel_blend_f(hs, m, wo, wi)
        return f, to_world(it, wi), pdf, False, False
    # matte (bxdf/mod.rs:103-121); single lobe -> no ng-recompute
    # (bsdf.rs:118-119 only re-evaluates when matching_comps > 1)
    wi = cosine_sample_hemisphere(u)
    if wo[2] < 0.0:
        wi[2] = -wi[2]
    pdf = F(0.0) if wo[2] * wi[2] <= 0.0 else F(abs(wi[2]) * INV_PI)
    wi_w = to_world(it, wi)
    f = lambertian_f(hs.mat_kd[it["material"]])
    return f, wi_w, pdf, False, False  # not specular


def uniform_sample_triangle(u):  # sampling.rs:84-94
    su0 = np.sqrt(F(u[0]))
    return F(1.0 - su0), F(u[1] * su0)


def tri_sample(hs, f, u):  # shape.rs:541-578
    b0, b1 = uniform_sample_triangle(u)
    b2 = F(1.0 - b0 - b1)
    p0, p1, p2 = hs.p0[f], hs.p1[f], hs.p2[f]
    p = (b0 * p0 + b1 * p1 + b2 * p2).astype(np.float32)
    n = normalize(cross((p1 - p0).astype(np.float32),
                        (p2 - p0).astype(np.float32)))
    if hs.has_normals[f]:
        ns = (b0 * hs.n0[f] + b1 * hs.n1[f] + b2 * hs.n2[f]) \
            .astype(np.float32)
        n = face_forward(n, ns)
    p_err = (GAMMA6 * (np.abs(b0 * p0) + np.abs(b1 * p1)
                       + np.abs(b2 * p2))).astype(np.float32)
    return p, n, p_err


def tri_pdf_at(hs, f, ref_p, ref_err, ref_n, wi):
    """pdf_at_point via re-intersection (shape.rs:50-72)."""
    o = offset_ray_origin(ref_p, ref_err, ref_n, wi)
    r = intersect_triangle(o, wi, F(np.inf), hs.p0[f], hs.p1[f], hs.p2[f])
    if r is None:
        return F(0.0)
    t = r[0]
    hp = (o + t * wi).astype(np.float32)
    p0, p1, p2 = hs.p0[f], hs.p1[f], hs.p2[f]
    n = normalize(cross((p0 - p2).astype(np.float32),
                        (p1 - p2).astype(np.float32)))
    area = F(0.5) * np.sqrt(dot(cross((p1 - p0).astype(np.float32),
                                      (p2 - p0).astype(np.float32)),
                                cross((p1 - p0).astype(np.float32),
                                      (p2 - p0).astype(np.float32))))
    diff = (ref_p - hp).astype(np.float32)
    dist_sq = dot(diff, diff)
    cos_abs = abs(dot(n, -wi))
    return F(dist_sq / max(cos_abs * area, F(1e-20)))


SHADOW_EPSILON = F(1e-4)


# ------------------------------------------------ infinite env light
def spherical_theta(v):  # math.rs spherical_theta (acos clamped z)
    return F(np.arccos(np.clip(v[2], -1.0, 1.0)))


def spherical_phi(v):
    p = F(np.arctan2(v[1], v[0]))
    return F(p + 2.0 * np.pi) if p < 0.0 else p


def env_lookup(hs, uv):
    """MIPMap lookup_width(st, 0): level-0 bilinear, repeat-u clamp-v
    (light.rs:440,497; texture.rs trilinear level 0)."""
    img = hs.env_map
    h, w = img.shape[0], img.shape[1]
    x = F(uv[0] * w - 0.5)
    y = F(uv[1] * h - 0.5)
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = F(x - x0), F(y - y0)
    xm, xp = x0 % w, (x0 + 1) % w
    ym, yp = min(max(y0, 0), h - 1), min(max(y0 + 1, 0), h - 1)
    top = img[ym, xm] * (1 - fx) + img[ym, xp] * fx
    bot = img[yp, xm] * (1 - fx) + img[yp, xp] * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def env_le(hs, d_world):
    """Escaped-ray env radiance (light.rs:488-498)."""
    if not hs.has_env:
        return v3(0.0, 0.0, 0.0)
    w = normalize((hs.world_to_env @ d_world).astype(np.float32))
    uv = (F(spherical_phi(w) / (2.0 * np.pi)),
          F(spherical_theta(w) / np.pi))
    return env_lookup(hs, uv)


def _find_interval(cdf, u):  # math.rs find_interval over cdf[i] <= u
    lo, hi = 0, len(cdf) - 1
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if cdf[mid] <= u:
            lo = mid
        else:
            hi = mid
    return min(max(lo, 0), len(cdf) - 2)


def _dist1d_sample(func, cdf, func_int, u):
    """Distribution1D::sample_continuous (sampling.rs:164-183)."""
    off = _find_interval(cdf, u)
    du = F(u - cdf[off])
    if cdf[off + 1] - cdf[off] > 0.0:
        du = F(du / (cdf[off + 1] - cdf[off]))
    pdf = F(func[off] / func_int) if func_int > 0.0 else F(0.0)
    return F((off + du) / len(func)), pdf, off


def env_sample_li(hs, it, u):
    """InfiniteAreaLight::sample_li (light.rs:401-441).

    Returns (li, wi_world, pdf, target_p)."""
    d1, pdf1, v = _dist1d_sample(hs.env_marg_func, hs.env_marg_cdf,
                                 hs.env_marg_int, F(u[1]))
    d0, pdf0, _ = _dist1d_sample(hs.env_cond_func[v], hs.env_cond_cdf[v],
                                 hs.env_cond_int[v], F(u[0]))
    map_pdf = F(pdf0 * pdf1)
    if map_pdf == 0.0:
        return v3(0.0, 0.0, 0.0), v3(0.0, 0.0, 1.0), F(0.0), it["p"]
    uv = (d0, d1)
    theta = F(uv[1] * np.pi)
    phi = F(uv[0] * 2.0 * np.pi)
    sin_t, cos_t = F(np.sin(theta)), F(np.cos(theta))
    w_l = v3(sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t)
    wi = (hs.env_to_world @ w_l).astype(np.float32)
    pdf = F(0.0) if sin_t == 0.0 else \
        F(map_pdf / (2.0 * np.pi * np.pi * sin_t))
    li = env_lookup(hs, uv)
    tgt = (it["p"] + wi * (2.0 * hs.world_radius)).astype(np.float32)
    return li, wi, pdf, tgt


def env_pdf_li(hs, w_world):
    """InfiniteAreaLight::pdf_li (light.rs:447-460)."""
    w = normalize((hs.world_to_env @ w_world).astype(np.float32))
    theta, phi = spherical_theta(w), spherical_phi(w)
    sin_t = F(np.sin(theta))
    if sin_t == 0.0:
        return F(0.0)
    nv, nu = hs.env_cond_func.shape
    iu = min(max(int(phi / (2.0 * np.pi) * nu), 0), nu - 1)
    iv = min(max(int(theta / np.pi * nv), 0), nv - 1)
    d2 = F(hs.env_cond_func[iv, iu] / max(hs.env_marg_int, F(1e-30)))
    return F(d2 / (2.0 * np.pi * np.pi * sin_t))


def light_sample_li(hs, light_idx, it, u_light):
    """Per-type sample_li dispatch (light.rs:100-121 point, :174-196
    distant, :261-280 area, :401-441 infinite). Returns (li, wi,
    light_pdf, target_p, target_err, target_n, is_delta)."""
    z3 = v3(0.0, 0.0, 0.0)
    ltype = int(hs.light_type[light_idx])
    emit = hs.light_emit[light_idx].astype(np.float32)
    if ltype == LIGHT_AREA:
        ltri = int(hs.light_tri[light_idx])
        ps, ns, perr = tri_sample(hs, ltri, u_light)
        wi = normalize((ps - it["p"]).astype(np.float32))
        light_pdf = tri_pdf_at(hs, ltri, it["p"], it["p_error"], it["ng"],
                               wi)
        li = emit if dot(ns, -wi) > 0.0 else z3
        return li, wi, light_pdf, ps, perr, ns, False
    if ltype == LIGHT_POINT:
        pl = hs.light_vec[light_idx].astype(np.float32)
        to_l = (pl - it["p"]).astype(np.float32)
        wi = normalize(to_l)
        li = (emit / max(dot(to_l, to_l), F(1e-30))).astype(np.float32)
        return li, wi, F(1.0), pl, z3, z3, True
    if ltype == LIGHT_DISTANT:
        wi = hs.light_vec[light_idx].astype(np.float32)
        tgt = (it["p"] + wi * (2.0 * hs.world_radius)).astype(np.float32)
        return emit, wi, F(1.0), tgt, z3, z3, True
    li, wi, pdf, tgt = env_sample_li(hs, it, u_light)
    return li, wi, pdf, tgt, z3, z3, False


def light_pdf_li(hs, light_idx, it, wi):
    """pdf_li dispatch: area via re-intersection (shape.rs:50-72), env via
    the 2D distribution, delta lights 0 (light.rs:126,198)."""
    ltype = int(hs.light_type[light_idx])
    if ltype == LIGHT_AREA:
        return tri_pdf_at(hs, int(hs.light_tri[light_idx]), it["p"],
                          it["p_error"], it["ng"], wi)
    if ltype == LIGHT_INFINITE:
        return env_pdf_li(hs, wi)
    return F(0.0)


def estimate_direct(hs, it, u_scatt, light_idx, u_light, wo_w):
    """integrator.rs:23-139 (all light types, no media)."""
    ld = v3(0.0, 0.0, 0.0)
    ltype = int(hs.light_type[light_idx])

    # light-sample branch
    li, wi, light_pdf, tgt_p, tgt_err, tgt_n, is_delta = \
        light_sample_li(hs, light_idx, it, u_light)
    if light_pdf > 0.0 and li.any():
        f = (bsdf_f(hs, it, wo_w, wi)
             * abs(dot(wi, it["ns"]))).astype(np.float32)
        scattering_pdf = bsdf_pdf(hs, it, wo_w, wi)
        if f.any():
            # VisibilityTester::unoccluded (interaction.rs:50-59 spawn_ray_to)
            o = offset_ray_origin(it["p"], it["p_error"], it["ng"],
                                  (tgt_p - it["p"]).astype(np.float32))
            tgt = offset_ray_origin(tgt_p, tgt_err, tgt_n,
                                    (o - tgt_p).astype(np.float32))
            d = (tgt - o).astype(np.float32)
            if hs.intersect_p(o, d, F(1.0) - SHADOW_EPSILON):
                li = v3(0.0, 0.0, 0.0)
            if li.any():
                if is_delta:
                    ld = (ld + f * li / light_pdf).astype(np.float32)
                else:
                    weight = power_heuristic(1, light_pdf, 1, scattering_pdf)
                    ld = (ld + f * li * weight / light_pdf) \
                        .astype(np.float32)

    # BSDF-sample branch, non-delta lights only
    if is_delta:
        return ld
    f, wi, scattering_pdf, sampled_spec, _ = bsdf_sample_f(hs, it, wo_w,
                                                           u_scatt)
    f = (f * abs(dot(wi, it["ns"]))).astype(np.float32)
    if f.any() and scattering_pdf > 0.0:
        weight = F(1.0)
        if not sampled_spec:
            light_pdf = light_pdf_li(hs, light_idx, it, wi)
            if light_pdf == 0.0:
                return ld
            weight = power_heuristic(1, scattering_pdf, 1, light_pdf)
        o = offset_ray_origin(it["p"], it["p_error"], it["ng"], wi)
        hit = hs.intersect(o, wi)
        li = v3(0.0, 0.0, 0.0)
        if hit is not None:
            # hit-the-light by light index (vs reference ptr equality)
            if ltype == LIGHT_AREA and \
                    int(hs.area_light_id[hit[0]]) == light_idx:
                it2 = make_interaction(hs, hit[0], hit[2], -wi)
                li = le(hs, it2, -wi)
        elif ltype == LIGHT_INFINITE:
            li = env_le(hs, wi)  # light.le(ray) on miss
        if li.any():
            ld = (ld + f * li * weight / scattering_pdf).astype(np.float32)
    return ld


def li(hs, draw, draw2, o, d, max_depth, rr_enable=True, rr_threshold=1.0,
       rr_start_depth=3):
    """integrator.rs:392-503, consuming static per-bounce dim slots."""
    l = v3(0.0, 0.0, 0.0)
    beta = v3(1.0, 1.0, 1.0)
    specular = False
    eta_scale = F(1.0)
    bounces = 0
    while True:
        dim = 2 + 8 * bounces
        hit = hs.intersect(o, d)
        if bounces == 0 or specular:
            if hit is not None:
                it0 = make_interaction(hs, hit[0], hit[2], -d)
                l = (l + beta * le(hs, it0, -d)).astype(np.float32)
            else:
                # infinite lights (integrator.rs:423-427)
                l = (l + beta * env_le(hs, d)).astype(np.float32)
        if hit is None or bounces >= max_depth:
            break
        it = make_interaction(hs, hit[0], hit[2], -d)
        wo = (-d).astype(np.float32)
        # NEE only with non-specular components (integrator.rs:443-447)
        if bsdf_has_nonspecular(hs, it["material"]) and hs.n_lights > 0:
            # uniform_sample_one_light (integrator.rs:192-217) with the
            # integrator's static slot layout
            u_light = draw2(dim + 0)
            u_scatt = draw2(dim + 2)
            if hs.n_lights > 1:
                u_pick = draw(dim + 4)
                light_idx = min(int(u_pick * hs.n_lights), hs.n_lights - 1)
            else:
                light_idx = 0
            ld = estimate_direct(hs, it, u_scatt, light_idx, u_light, wo)
            l = (l + beta * ld * F(hs.n_lights)).astype(np.float32)

        u_bsdf = draw2(dim + 5)
        f, wi, pdf, spec, trans = bsdf_sample_f(hs, it, wo, u_bsdf)
        if not f.any() or pdf == 0.0:
            break
        beta = (beta * f * abs(dot(wi, it["ns"])) / pdf).astype(np.float32)
        specular = spec
        if spec and trans:
            # eta_scale through specular transmission (integrator.rs:471-480)
            eta = F(hs.mat_eta[it["material"]][0])
            eta_scale = F(eta_scale * (eta * eta if dot(wo, it["ng"]) > 0.0
                                       else 1.0 / (eta * eta)))
        o = offset_ray_origin(it["p"], it["p_error"], it["ng"], wi)
        d = wi
        if rr_enable:
            rr_beta_max = F((beta * eta_scale).max())
            if rr_beta_max < rr_threshold and bounces > rr_start_depth:
                q = max(F(0.05), F(1.0 - rr_beta_max))
                if draw(dim + 7) < q:
                    break
                beta = (beta / (F(1.0) - q)).astype(np.float32)
        bounces += 1
    return l
