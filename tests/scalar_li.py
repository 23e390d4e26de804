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

Scope: matte materials + area lights (the cornell workload).
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
                     "light_tri", "light_type", "mat_kd"):
            setattr(self, name, np.asarray(getattr(sd, name)))
        self.has_normals = np.asarray(sd.has_normals)
        self.n_lights = int(np.asarray(sd.n_lights))

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


def bsdf_f(hs, it, wo_w, wi_w):
    """bsdf.rs:150-187: hemisphere routing by geometric normal."""
    reflect = dot(wi_w, it["ng"]) * dot(wo_w, it["ng"]) > 0.0
    wo = to_local(it, wo_w)
    if wo[2] == 0.0 or not reflect:
        return v3(0.0, 0.0, 0.0)
    return lambertian_f(hs.mat_kd[it["material"]])


def bsdf_pdf(it, wo_w, wi_w):
    wo = to_local(it, wo_w)
    wi = to_local(it, wi_w)
    if wo[2] == 0.0 or wo[2] * wi[2] <= 0.0:
        return F(0.0)
    return F(abs(wi[2]) * INV_PI)


def bsdf_sample_f(hs, it, wo_w, u):
    """Matte sample (bxdf/mod.rs:103-121 via bsdf.rs:66-148)."""
    wo = to_local(it, wo_w)
    wi = cosine_sample_hemisphere(u)
    if wo[2] < 0.0:
        wi[2] = -wi[2]
    pdf = F(0.0) if wo[2] * wi[2] <= 0.0 else F(abs(wi[2]) * INV_PI)
    wi_w = to_world(it, wi)
    reflect = dot(wi_w, it["ng"]) * dot(wo_w, it["ng"]) > 0.0
    f = lambertian_f(hs.mat_kd[it["material"]]) if reflect and wo[2] != 0.0 \
        else v3(0.0, 0.0, 0.0)
    return f, wi_w, pdf, False  # not specular


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


def estimate_direct(hs, it, u_scatt, light_idx, u_light, wo_w):
    """integrator.rs:23-139 (area lights, no media)."""
    ld = v3(0.0, 0.0, 0.0)
    ltri = int(hs.light_tri[light_idx])
    emit = hs.light_emit[light_idx].astype(np.float32)

    # light-sample branch (light.rs:261-280 sample_li)
    ps, ns, perr = tri_sample(hs, ltri, u_light)
    wi = normalize((ps - it["p"]).astype(np.float32))
    light_pdf = tri_pdf_at(hs, ltri, it["p"], it["p_error"], it["ng"], wi)
    li = emit if dot(ns, -wi) > 0.0 else v3(0.0, 0.0, 0.0)
    if light_pdf > 0.0 and li.any():
        f = (bsdf_f(hs, it, wo_w, wi)
             * abs(dot(wi, it["ns"]))).astype(np.float32)
        scattering_pdf = bsdf_pdf(it, wo_w, wi)
        if f.any():
            # VisibilityTester::unoccluded (interaction.rs:50-59 spawn_ray_to)
            o = offset_ray_origin(it["p"], it["p_error"], it["ng"],
                                  (ps - it["p"]).astype(np.float32))
            tgt = offset_ray_origin(ps, perr, ns, (o - ps).astype(np.float32))
            d = (tgt - o).astype(np.float32)
            if hs.intersect_p(o, d, F(1.0) - SHADOW_EPSILON):
                li = v3(0.0, 0.0, 0.0)
            if li.any():
                weight = power_heuristic(1, light_pdf, 1, scattering_pdf)
                ld = (ld + f * li * weight / light_pdf).astype(np.float32)

    # BSDF-sample branch
    f, wi, scattering_pdf, sampled_spec = bsdf_sample_f(hs, it, wo_w, u_scatt)
    f = (f * abs(dot(wi, it["ns"]))).astype(np.float32)
    if f.any() and scattering_pdf > 0.0:
        weight = F(1.0)
        if not sampled_spec:
            light_pdf = tri_pdf_at(hs, ltri, it["p"], it["p_error"],
                                   it["ng"], wi)
            if light_pdf == 0.0:
                return ld
            weight = power_heuristic(1, scattering_pdf, 1, light_pdf)
        o = offset_ray_origin(it["p"], it["p_error"], it["ng"], wi)
        hit = hs.intersect(o, wi)
        li = v3(0.0, 0.0, 0.0)
        if hit is not None:
            # hit-the-light by light index (vs reference ptr equality)
            if int(hs.area_light_id[hit[0]]) == light_idx:
                it2 = make_interaction(hs, hit[0], hit[2], -wi)
                li = le(hs, it2, -wi)
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
            # (no infinite lights in scope)
        if hit is None or bounces >= max_depth:
            break
        it = make_interaction(hs, hit[0], hit[2], -d)
        # uniform_sample_one_light (integrator.rs:192-217) with the
        # integrator's static slot layout
        u_light = draw2(dim + 0)
        u_scatt = draw2(dim + 2)
        if hs.n_lights > 1:
            u_pick = draw(dim + 4)
            light_idx = min(int(u_pick * hs.n_lights), hs.n_lights - 1)
        else:
            light_idx = 0
        wo = (-d).astype(np.float32)
        ld = estimate_direct(hs, it, u_scatt, light_idx, u_light, wo)
        l = (l + beta * ld * F(hs.n_lights)).astype(np.float32)

        u_bsdf = draw2(dim + 5)
        f, wi, pdf, spec = bsdf_sample_f(hs, it, wo, u_bsdf)
        if not f.any() or pdf == 0.0:
            break
        beta = (beta * f * abs(dot(wi, it["ns"])) / pdf).astype(np.float32)
        specular = spec
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
