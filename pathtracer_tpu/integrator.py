"""Wavefront path integrator: NEE + MIS + Russian roulette, fully batched.

TPU-native rebuild of the reference's recursive per-pixel megakernel
(``src/pathtracer/integrator.rs``): the bounce recursion (li :392-503)
becomes a ``lax.while_loop`` over SoA wavefront state {ray, beta, L, sobol
dim counters, alive mask}; ``estimate_direct`` (:23-139, both-strategy MIS)
and ``uniform_sample_one_light`` (:192-217) are evaluated for every live ray
at once. The rayon tile fan-out (:617-637) becomes (a) on-chip
vectorization over the whole pixel wave and (b) cross-chip data parallelism
(parallel/mesh.py). Per-iteration cost mirrors the reference hot path
(SURVEY §3.2): one closest-hit + one shadow any-hit + one MIS closest-hit.

Sampling matches the Sobol sampler exactly: per-ray dimension counters with
the reference's dim==4→5 get_2d skip (sampler/mod.rs get_2d via
sampler/sobol.rs:139-151) and conditional consumption (NEE dims only for
materials with non-specular lobes; RR dim only when the RR gate opens).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core import math as pm
from .core.camera import Camera, generate_rays
from .core.film import add_samples, film_new, sample_bounds
from .core.filter import make_filter
from .ops import bsdf as bx
from .ops import interaction as ia
from .ops import lights as lt
from .ops import sobol as sb
from .ops.intersect import intersect_brute, intersect_p_brute


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """Integrator knobs (ref integrator.rs:219-246)."""

    max_depth: int = 15
    rr_threshold: float = 1.0
    rr_start_depth: int = 3
    rr_enable: bool = True
    sanitize: bool = True  # zero non-finite radiance instead of logging


def _get_2d_dim(dim):
    """Reference get_2d dimension skip: dim==4 jumps to ARRAY_START_DIM=5."""
    return jnp.where(dim == 4, 5, dim)


def _scene_intersect(scene, o, d, t_max):
    return intersect_brute(o, d, t_max, scene.p0, scene.p1, scene.p2)


def _scene_intersect_p(scene, o, d, t_max):
    return intersect_p_brute(o, d, t_max, scene.p0, scene.p1, scene.p2)


def _to_local(it, w):
    return jnp.stack([pm.dot(w, it["ss"]), pm.dot(w, it["ts"]),
                      pm.dot(w, it["ns"])], axis=-1)


def _to_world(it, w):
    return (w[..., 0:1] * it["ss"] + w[..., 1:2] * it["ts"]
            + w[..., 2:3] * it["ns"])


def _sample_dims(sobol_pack, idx_lo, idx_hi, scramble, dim):
    """One Sobol dimension for each ray at its own dim counter."""
    return sb.sobol_sample(idx_lo, idx_hi, dim, scramble, sobol_pack)


def estimate_direct(scene, cfg, it, mp, u_scatt, u_light, light_idx,
                    wo_world):
    """Both-strategy MIS direct lighting for one chosen light per ray.

    Ref integrator.rs:23-139. Returns (N, 3) radiance estimate (pre
    num_lights scaling).
    """
    n = wo_world.shape[0]
    ld = jnp.zeros((n, 3), jnp.float32)

    ls = lt.sample_li(scene, light_idx, it["p"], it["p_error"], it["ng"],
                      u_light)
    wi = ls["wi"]

    # --- light-sample branch (integrator.rs:44-80)
    wo_l = _to_local(it, wo_world)
    wi_l = _to_local(it, wi)
    reflect_ng = (pm.dot(wi, it["ng"]) * pm.dot(wo_world, it["ng"])) > 0.0
    f, scatt_pdf = bx.eval_f_pdf(mp, wo_l, wi_l, reflect_ng)
    f = f * jnp.abs(pm.dot(wi, it["ns"]))[..., None]

    branch1 = (ls["pdf"] > 0.0) & jnp.any(ls["li"] != 0.0, axis=-1) & \
        jnp.any(f != 0.0, axis=-1)
    # visibility (light.rs:33-42)
    so, sd, st = ia.spawn_ray_to(it["p"], it["p_error"], it["ng"],
                                 ls["target_p"], ls["target_err"],
                                 ls["target_n"])
    occluded = _scene_intersect_p(scene, so, sd, st)
    li1 = jnp.where((branch1 & ~occluded)[..., None], ls["li"], 0.0)
    w1 = jnp.where(ls["is_delta"], 1.0,
                   pm.power_heuristic(1.0, ls["pdf"], 1.0, scatt_pdf))
    contrib1 = f * li1 * w1[..., None] / jnp.maximum(ls["pdf"], 1e-20)[..., None]
    ld = ld + jnp.where(branch1[..., None], contrib1, 0.0)

    # --- BSDF-sample branch (integrator.rs:82-136), non-delta lights only
    bs = bx.sample_f(
        mp, wo_l, u_scatt,
        lambda wi_loc: (pm.dot(_to_world(it, wi_loc), it["ng"])
                        * pm.dot(wo_world, it["ng"])) > 0.0)
    wi2_w = _to_world(it, bs["wi"])
    f2 = bs["f"] * jnp.abs(pm.dot(wi2_w, it["ns"]))[..., None]
    branch2 = (~ls["is_delta"]) & jnp.any(f2 != 0.0, axis=-1) & (bs["pdf"] > 0.0)
    light_pdf2 = lt.pdf_li(scene, light_idx, it["p"], it["p_error"],
                           it["ng"], wi2_w)
    # sampled_specular is false for all materials reaching NEE
    w2 = pm.power_heuristic(1.0, bs["pdf"], 1.0, light_pdf2)
    branch2 = branch2 & (light_pdf2 > 0.0)

    o2 = ia.spawn_ray(it["p"], it["p_error"], it["ng"], wi2_w)
    hit2 = _scene_intersect(scene, o2, wi2_w,
                            jnp.full((n,), jnp.inf, jnp.float32))
    # "did we hit the chosen light" by light-id (vs pointer eq, :124-127)
    hit_tri_light = jnp.where(hit2["valid"],
                              scene.area_light_id[hit2["tri"]], -1)
    hit_the_light = hit2["valid"] & (hit_tri_light == light_idx) & \
        (scene.light_type[light_idx] == 0)
    it2 = ia.make_interaction(scene, o2, wi2_w, hit2)
    li2_hit = ia.emitted_radiance(scene, it2, -wi2_w)
    li2_env = jnp.where((ls["is_env"] & ~hit2["valid"])[..., None],
                        lt.env_le(scene, wi2_w), 0.0)
    li2 = jnp.where(hit_the_light[..., None], li2_hit, li2_env)
    contrib2 = f2 * li2 * w2[..., None] / jnp.maximum(bs["pdf"], 1e-20)[..., None]
    ld = ld + jnp.where(branch2[..., None], contrib2, 0.0)
    return ld


def trace_wave(scene, cfg: PathConfig, sobol_pack, domain_consts,
               o, d, idx_lo, idx_hi, scramble, dim0):
    """Trace one wavefront of rays to completion; returns radiance (N, 3).

    The bounce loop state is SoA; dead lanes are masked, the loop exits when
    every lane is dead or the depth cap is reached (ref li(), :392-503).
    """
    n = o.shape[0]
    f32 = jnp.float32

    state = dict(
        o=o, d=d,
        l=jnp.zeros((n, 3), f32),
        beta=jnp.ones((n, 3), f32),
        active=jnp.ones((n,), bool),
        specular=jnp.zeros((n,), bool),
        eta_scale=jnp.ones((n,), f32),
        dim=dim0,
        bounces=jnp.int32(0),
    )

    has_lights = True  # host-static: scenes with zero lights skip NEE

    def cond(st):
        return (st["bounces"] <= cfg.max_depth) & jnp.any(st["active"])

    def body(st):
        o, d = st["o"], st["d"]
        active = st["active"]
        beta = st["beta"]
        l = st["l"]
        dim = st["dim"]

        hit = _scene_intersect(scene, o, d, jnp.full((n,), jnp.inf, f32))
        found = hit["valid"] & active
        it = ia.make_interaction(scene, o, d, hit)

        # emitted radiance on camera/specular bounces (:418-427)
        le_mask = active & ((st["bounces"] == 0) | st["specular"])
        le_hit = ia.emitted_radiance(scene, it, -d)
        l = l + jnp.where((le_mask & found)[..., None], beta * le_hit, 0.0)
        le_env = lt.env_le(scene, d)
        l = l + jnp.where((le_mask & ~hit["valid"])[..., None],
                          beta * le_env, 0.0)

        cont = found & (st["bounces"] < cfg.max_depth)

        mp = bx.gather_params(scene, it["material"])
        wo = -d

        # --- NEE (:443-447): dims consumed only by non-specular materials
        if has_lights:
            nonspec = bx.has_nonspecular(mp["mtype"]) & cont
            d1 = _get_2d_dim(dim)
            u_light = jnp.stack(
                [_sample_dims(sobol_pack, idx_lo, idx_hi, scramble, d1),
                 _sample_dims(sobol_pack, idx_lo, idx_hi, scramble, d1 + 1)],
                axis=-1)
            d2 = _get_2d_dim(d1 + 2)
            u_scatt = jnp.stack(
                [_sample_dims(sobol_pack, idx_lo, idx_hi, scramble, d2),
                 _sample_dims(sobol_pack, idx_lo, idx_hi, scramble, d2 + 1)],
                axis=-1)
            u_pick = _sample_dims(sobol_pack, idx_lo, idx_hi, scramble,
                                  d2 + 2)
            dim_after_nee = d2 + 3
            n_l = scene.n_lights.astype(f32)
            light_idx = jnp.minimum((u_pick * n_l).astype(jnp.int32),
                                    scene.n_lights - 1)
            ld = estimate_direct(scene, cfg, it, mp, u_scatt, u_light,
                                 light_idx, wo)
            l = l + jnp.where(nonspec[..., None], beta * ld * n_l[..., None],
                              0.0)
            dim = jnp.where(nonspec, dim_after_nee, dim)

        # --- BSDF sampling for the next bounce (:449-468)
        db = _get_2d_dim(dim)
        u_bsdf = jnp.stack(
            [_sample_dims(sobol_pack, idx_lo, idx_hi, scramble, db),
             _sample_dims(sobol_pack, idx_lo, idx_hi, scramble, db + 1)],
            axis=-1)
        dim = jnp.where(cont, db + 2, dim)
        wo_l = _to_local(it, wo)
        bs = bx.sample_f(
            mp, wo_l, u_bsdf,
            lambda wi_loc: (pm.dot(_to_world(it, wi_loc), it["ng"])
                            * pm.dot(wo, it["ng"])) > 0.0)
        wi_w = _to_world(it, bs["wi"])
        cos_ns = jnp.abs(pm.dot(wi_w, it["ns"]))
        dead = jnp.all(bs["f"] == 0.0, axis=-1) | (bs["pdf"] == 0.0)
        new_beta = beta * bs["f"] * (cos_ns / jnp.maximum(bs["pdf"], 1e-20))[..., None]
        cont2 = cont & ~dead
        beta = jnp.where(cont2[..., None], new_beta, beta)
        specular = jnp.where(cont2, bs["specular"], st["specular"])

        # eta_scale for RR through glass (:471-480)
        spec_trans = bs["specular"] & bs["transmission"]
        eta = mp["eta"]
        scale = jnp.where(pm.dot(wo, it["ng"]) > 0.0, eta * eta,
                          1.0 / jnp.maximum(eta * eta, 1e-20))
        eta_scale = jnp.where(cont2 & spec_trans,
                              st["eta_scale"] * scale, st["eta_scale"])

        new_o = ia.spawn_ray(it["p"], it["p_error"], it["ng"], wi_w)
        o = jnp.where(cont2[..., None], new_o, o)
        d = jnp.where(cont2[..., None], wi_w, d)

        # --- Russian roulette (:486-497), sample consumed only when gated
        if cfg.rr_enable:
            rr_beta_max = jnp.max(beta * eta_scale[..., None], axis=-1)
            rr_gate = cont2 & (rr_beta_max < cfg.rr_threshold) & \
                (st["bounces"] > cfg.rr_start_depth)
            u_rr = _sample_dims(sobol_pack, idx_lo, idx_hi, scramble, dim)
            dim = jnp.where(rr_gate, dim + 1, dim)
            q = jnp.maximum(0.05, 1.0 - rr_beta_max)
            rr_kill = rr_gate & (u_rr < q)
            beta = jnp.where((rr_gate & ~rr_kill)[..., None],
                             beta / (1.0 - q)[..., None], beta)
            cont2 = cont2 & ~rr_kill

        return dict(o=o, d=d, l=l, beta=beta, active=cont2,
                    specular=specular, eta_scale=eta_scale, dim=dim,
                    bounces=st["bounces"] + 1)

    final = jax.lax.while_loop(cond, body, state)
    out = final["l"]
    if cfg.sanitize:
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "spp", "res"))
def render_tile(scene, cfg: PathConfig, spp: int, res: tuple[int, int],
                film, px, py, b_base, scramble, frame_lo, frame_hi,
                frame_delta, inv_lo, inv_hi, r2c, cam_rot, cam_pos,
                filter_table, sobol_pack, sobol_scale, sobol_off_x,
                sobol_off_y):
    """Render `spp` Sobol samples for one batch of pixels into the film.

    px/py: (N,) absolute pixel coords (may reach outside the film by the
    filter radius — ref film.rs:174-185); frame_*: (spp,) per-sample-index
    host-precomputed Sobol constants.
    """

    def per_frame(s, film):
        idx_lo, idx_hi = sb.sobol_index(
            b_base, frame_delta[s], frame_lo[s], frame_hi[s], inv_lo, inv_hi)
        # camera sample: dims 0,1 remapped into the pixel (sobol.rs:116-120)
        s0 = sb.sobol_sample(idx_lo, idx_hi,
                             jnp.zeros_like(px), scramble, sobol_pack)
        s1 = sb.sobol_sample(idx_lo, idx_hi,
                             jnp.ones_like(px), scramble, sobol_pack)
        jx = jnp.clip(s0 * sobol_scale + sobol_off_x - px.astype(jnp.float32),
                      0.0, pm.ONE_MINUS_EPSILON)
        jy = jnp.clip(s1 * sobol_scale + sobol_off_y - py.astype(jnp.float32),
                      0.0, pm.ONE_MINUS_EPSILON)
        p_film = jnp.stack([px.astype(jnp.float32) + jx,
                            py.astype(jnp.float32) + jy], axis=-1)
        o, d = generate_rays(r2c, cam_rot, cam_pos, p_film)
        dim0 = jnp.full(px.shape, 2, jnp.int32)
        radiance = trace_wave(scene, cfg, sobol_pack, None, o, d,
                              idx_lo, idx_hi, scramble, dim0)
        return add_samples(film, p_film, radiance, filter_table)

    film = jax.lax.fori_loop(0, spp, per_frame, film)
    return film


class PathIntegrator:
    """Host-side driver mirroring the reference render() entry
    (integrator.rs:536-642): builds the sample-bounds pixel grid, batches
    it into waves, and runs the jitted per-tile renderer.
    """

    def __init__(self, cfg: PathConfig = PathConfig(), spp: int = 4,
                 filter_kind: str = "gaussian", tile_pixels: int = 1 << 16):
        self.cfg = cfg
        self.spp = pm.round_up_pow2(spp)
        self.filter_table, self.filter_radius = make_filter(filter_kind)
        self.tile_pixels = tile_pixels

    def render(self, camera: Camera, scene) -> jnp.ndarray:
        w, h = camera.resolution
        (x0, y0), (x1, y1) = sample_bounds(w, h, self.filter_radius)
        domain = sb.SobolDomain.create((x0, y0), (x1, y1), self.spp)

        xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1),
                             indexing="xy")
        px_all = xs.ravel().astype(np.int32)
        py_all = ys.ravel().astype(np.int32)

        frame_lo = np.zeros(self.spp, np.uint32)
        frame_hi = np.zeros(self.spp, np.uint32)
        frame_delta = np.zeros(self.spp, np.uint32)
        for s in range(self.spp):
            lo, hi, delta = sb.frame_statics(domain, s)
            frame_lo[s], frame_hi[s], frame_delta[s] = lo, hi, delta
        inv_lo, inv_hi = sb.vdc_inv_rows(domain)
        sobol_pack = sb.sm32_device()

        r2c, cam_rot, cam_pos = camera.ray_params()
        film = film_new(w, h)
        ft = jnp.asarray(self.filter_table)

        bsz = self.tile_pixels
        n_total = len(px_all)
        for start in range(0, n_total, bsz):
            px = px_all[start:start + bsz]
            py = py_all[start:start + bsz]
            if len(px) < bsz:  # pad; offscreen pixels are masked in the splat
                pad = bsz - len(px)
                px = np.concatenate([px, np.full(pad, -10_000, np.int32)])
                py = np.concatenate([py, np.full(pad, -10_000, np.int32)])
            scramble, b_base = sb.pixel_statics(domain, px, py)
            film = render_tile(
                scene, self.cfg, self.spp, (w, h), film,
                jnp.asarray(px), jnp.asarray(py), jnp.asarray(b_base),
                jnp.asarray(scramble), jnp.asarray(frame_lo),
                jnp.asarray(frame_hi), jnp.asarray(frame_delta),
                inv_lo, inv_hi, r2c, cam_rot, cam_pos, ft, sobol_pack,
                jnp.float32(domain.resolution),
                jnp.float32(domain.p_min[0]), jnp.float32(domain.p_min[1]))
        return film
