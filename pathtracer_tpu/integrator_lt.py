"""Light tracing: adjoint particle transport built on the emission API.

Paths start ON the lights (ops/lights.sample_le), bounce through the
scene, and every vertex is connected to the pinhole camera — visibility
tested, importance-weighted, splatted to the film. In expectation this
equals the path-traced image of the same scene, which makes it both a
capability the reference cannot offer (its Light::sample_le is ``todo!``
for every type, light.rs:131,207,296,466) and a whole-system
cross-check: two INDEPENDENT transport estimators agreeing pins emission
sampling, BSDF evaluation, visibility, and the camera model at once
(tests/test_lighttrace.py).

Estimator. A light path y0, y1, ... carries flux throughput
    beta_1 = Le * cos(n_l, d) / (p_light * p_pos * p_dir)
    beta_{k+1} = beta_k * f(y_k) * |cos(ns_k, w_out)| / p_scatter,
and each vertex splats to its projected pixel
    dI_j = beta_k * f(y_k, w_in -> w_cam) * |cos(ns_k, w_cam)|
           * V(y_k, cam) * We / r^2,
where We = z0^2 / (A_pix * cos^3 theta_cam) converts flux at the pinhole
into PIXEL-MEAN RADIANCE — the same quantity the path-traced film stores
(box reconstruction; derivation: raster area du -> solid angle
d_omega = A_pix * z0 / |p_plane|^3 du with |p_plane| = z0/cos theta_cam,
then d_omega -> surface area via cos/r^2). The emission vertex y0 itself
connects with f replaced by the one-sided emitted radiance (area lights
only; delta and infinite lights are invisible to a pinhole by measure).

Path-length bookkeeping matches PathIntegrator(max_depth=D) in "ref" MIS
mode: the camera image covers transport paths of 1..D+1 segments (direct
Le at bounce 0 + NEE at bounces 0..D-1), so the tracer emits D surface
vertices and connects y0..y_D.

Documented limits (standard for plain light tracing): specular chains
toward the camera contribute nothing (delta lobes eval to 0);
transport-mode asymmetries (the eta^2 radiance scaling inside specular /
rough transmission, shading-normal adjoint correction) are NOT
corrected, so transmissive scenes differ slightly from the path tracer;
uniform random sampling (no Sobol) — light paths have no pixel to anchor
a low-discrepancy sequence to.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core import math as pm
from .core.camera import Camera, project_points
from .integrator import (PathConfig, TracedScene, _scene_intersect,
                         _scene_intersect_p, _to_local, _to_world)
from .ops import bsdf as bx
from .ops import interaction as ia
from .ops import lights as lt
from .ops.gather import take_rows
from .scene.scene import LIGHT_AREA


def _splat(scene, cam, film, p, perr, n_spawn, value, alive):
    """Connect points to the pinhole and scatter-add into film.

    value: (N, 3) transported quantity WITHOUT the surface cosine / r^2 /
    importance factors (beta*f*cos for path vertices, one-sided Le for
    the emission vertex — the caller folds its own cosine in).
    Returns the updated (H, W, 3) film."""
    c2r, w2c_rot, w2c_pos, fwd, imp = cam
    # w2c maps world->cam: x_cam = R x + t, so the pinhole sits at -R^T t
    cam_pos = -(w2c_rot.T @ w2c_pos)
    to_cam = cam_pos - p
    r2 = pm.norm_sq(to_cam)
    w_cam = to_cam / jnp.sqrt(jnp.maximum(r2, 1e-30))[..., None]
    raster, z_cam = project_points(c2r, w2c_rot, w2c_pos, p)
    h, w = film.shape[0], film.shape[1]
    px = jnp.floor(raster[..., 0]).astype(jnp.int32)
    py = jnp.floor(raster[..., 1]).astype(jnp.int32)
    in_img = (z_cam < 0.0) & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    live = alive & in_img & jnp.any(value != 0.0, axis=-1)
    # visibility: occluded unless the segment to the camera is clear;
    # dead lanes enter with t_max = 0 (wavefront compaction contract)
    so, sdir, st = ia.spawn_ray_to(p, perr, n_spawn, cam_pos,
                                   jnp.zeros_like(p), jnp.zeros_like(p))
    occ = _scene_intersect_p(scene, so, sdir, jnp.where(live, st, 0.0))
    cos_cam = jnp.maximum(pm.dot(w_cam, -fwd), 1e-6)
    we = imp / (cos_cam ** 3)
    contrib = value * (we / jnp.maximum(r2, 1e-30))[..., None]
    ok = live & ~occ
    return film.at[py, px].add(
        jnp.where(ok[..., None], contrib, 0.0), mode="drop")


@functools.partial(jax.jit, static_argnames=("depth", "n"))
def _lt_wave(scene, film, key, cam, depth: int, n: int):
    """One wave of n light paths -> film increments (H, W, 3 sums)."""
    sd = scene.data
    f32 = jnp.float32
    ks = jax.random.split(key, 3 + depth)
    u_pick = jax.random.uniform(ks[0], (n,))
    u_pos = jax.random.uniform(ks[1], (n, 2))
    u_dir = jax.random.uniform(ks[2], (n, 2))

    n_l = max(scene.n_lights, 1)
    lidx = jnp.minimum((u_pick * n_l).astype(jnp.int32), n_l - 1)
    rows = take_rows(scene.light_attr, lidx)
    ltype = rows[:, 0].astype(jnp.int32)

    s = lt.sample_le(sd, rows, u_pos, u_dir, light_set=scene.light_set)
    pdf = s["pdf_pos"] * s["pdf_dir"]
    alive = (pdf > 0.0) & jnp.any(s["le"] != 0.0, axis=-1)
    cos0 = jnp.abs(pm.dot(s["n_light"], s["d"]))
    beta = s["le"] * (n_l * cos0 / jnp.maximum(pdf, 1e-30))[..., None]
    beta = jnp.where(alive[..., None], beta, 0.0)

    # y0 -> camera: the emission vertex itself, one-sided (area only —
    # a pinhole sees delta/infinite lights with probability zero)
    if LIGHT_AREA in scene.light_set:
        c2r, w2c_rot, w2c_pos, fwd, imp = cam
        cam_pos = -(w2c_rot.T @ w2c_pos)
        w_cam0 = pm.normalize(cam_pos - s["o"])
        cos_l = pm.dot(s["n_light"], w_cam0)  # one-sided: > 0 emits
        val0 = rows[:, 1:4] * \
            (n_l * jnp.maximum(cos_l, 0.0)
             / jnp.maximum(s["pdf_pos"], 1e-30))[..., None]
        val0 = jnp.where((alive & (ltype == LIGHT_AREA))[..., None],
                         val0, 0.0)
        film = _splat(scene, cam, film, s["o"], jnp.zeros_like(s["o"]),
                      s["n_light"], val0, alive & (ltype == LIGHT_AREA))

    o, d = s["o"], s["d"]
    for k in range(depth):
        hit = _scene_intersect(scene, o, d,
                               jnp.where(alive, jnp.inf, 0.0).astype(f32))
        alive = alive & hit["valid"]
        it = ia.make_interaction(sd, o, d, hit, scene.tri_attr)
        if scene.has_normal_maps:
            it = ia.apply_normal_mapping(sd, it)
        mp = bx.gather_params(sd, it["material"], it["uv"],
                              mat_attr=scene.mat_attr,
                              has_tex=scene.has_tex,
                              tex_channels=scene.tex_channels)
        wo_w = -d
        wo_l = _to_local(it, wo_w)

        # connect y_k -> camera
        cam_pos = -(cam[1].T @ cam[2])
        w_cam = pm.normalize(cam_pos - it["p"])
        reflect_ng = (pm.dot(w_cam, it["ng"]) * pm.dot(wo_w, it["ng"])) > 0.0
        f_cam, _ = bx.eval_f_pdf(mp, wo_l, _to_local(it, w_cam),
                                 reflect_ng, present=scene.mat_set)
        val = beta * f_cam * jnp.abs(pm.dot(w_cam, it["ns"]))[..., None]
        film = _splat(scene, cam, film, it["p"], it["p_error"], it["ng"],
                      jnp.where(alive[..., None], val, 0.0), alive)

        if k + 1 == depth:
            break
        # continue the light path
        u = jax.random.uniform(ks[3 + k], (n, 2))
        bs = bx.sample_f(
            mp, wo_l, u,
            lambda wl, it=it, wo_w=wo_w: (
                pm.dot(_to_world(it, wl), it["ng"])
                * pm.dot(wo_w, it["ng"])) > 0.0,
            present=scene.mat_set)
        wi_w = _to_world(it, bs["wi"])
        step = bs["f"] * (jnp.abs(pm.dot(wi_w, it["ns"]))
                          / jnp.maximum(bs["pdf"], 1e-30))[..., None]
        alive = alive & (bs["pdf"] > 0.0) & jnp.any(step != 0.0, axis=-1)
        beta = jnp.where(alive[..., None], beta * step, 0.0)
        o = ia.spawn_ray(it["p"], it["p_error"], it["ng"], wi_w)
        d = wi_w
    return film


class LightTracer:
    """Adjoint counterpart of PathIntegrator; same (H, W, 4) film.

    ``max_depth`` means the same as PathConfig.max_depth: the rendered
    image covers transport paths of up to max_depth+1 segments."""

    def __init__(self, cfg: PathConfig = PathConfig(), paths: int = 1 << 20,
                 wave: int = 1 << 16, seed: int = 0):
        self.cfg = cfg
        self.wave = wave
        self.waves = max(1, -(-paths // wave))
        self.paths = self.waves * wave
        self.seed = seed
        self.last_ray_count = 0.0

    def render(self, camera: Camera, scene) -> jnp.ndarray:
        if not isinstance(scene, TracedScene):
            scene = TracedScene.create(scene)
        w, h = camera.resolution
        cam = camera.project_params()
        film = jnp.zeros((h, w, 3), jnp.float32)
        key = jax.random.PRNGKey(self.seed)
        for i in range(self.waves):
            film = _lt_wave(scene, film, jax.random.fold_in(key, i), cam,
                            depth=self.cfg.max_depth, n=self.wave)
        # each wave traces depth segments + depth+1 camera connections
        self.last_ray_count = float(self.paths * (2 * self.cfg.max_depth + 1))
        rgb = np.asarray(film) / self.paths
        return jnp.concatenate([jnp.asarray(rgb),
                                jnp.ones((h, w, 1), jnp.float32)], axis=-1)
