"""Sponza SHADING-stage ledger: the bounce body minus traversals.

The d1 ledger (tools/profile_sponza.py) put ~2.8 s of a 65k-lane bounce
outside the three traversals. This times each stage in isolation:
interaction build, material gather (textures), light sample, BSDF
eval+sample, spawn — so the heavy stage is identified before optimizing.

Draw closures are dim-SALTED (dim*0.37 folded in) so XLA cannot CSE two
BSDF samples into one — the constant-draw trap that made ref-MIS look
free in profile_sponza.

Usage: python tools/profile_shade.py [n_rays]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtracer_tpu.core import math as pm  # noqa: E402
from pathtracer_tpu.integrator import (PathConfig, TracedScene,  # noqa
                                       _scene_intersect, _scene_intersect_p,
                                       _to_local, _to_world, estimate_direct,
                                       trace_wave)
from pathtracer_tpu.ops import bsdf as bx  # noqa: E402
from pathtracer_tpu.ops import interaction as ia  # noqa: E402
from pathtracer_tpu.ops import lights as lt  # noqa: E402
from pathtracer_tpu.ops.gather import take_rows  # noqa: E402
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

cam, sd_, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
scene = TracedScene.create(sd_)
sd = scene.data
print(f"ready split={scene.bvh_alpha is not None}", flush=True)

rng = np.random.default_rng(0)
center = np.asarray(0.5 * (np.asarray(sd_.p0).min(0)
                           + np.asarray(sd_.p0).max(0)))
o = jnp.asarray(np.tile(center[None, :] + np.array([0, 1, 0], np.float32),
                        (N, 1)).astype(np.float32))
dn = rng.normal(size=(N, 3)).astype(np.float32)
dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
d = jnp.asarray(dn)
t_inf = jnp.full((N,), jnp.inf, jnp.float32)
u1 = jnp.asarray(rng.random(N).astype(np.float32))
u2 = jnp.asarray(rng.random((N, 2)).astype(np.float32))


def timed(name, fn, *args, reps=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:8.1f} ms", flush=True)
    return dt


# --- traversals with the alpha-first order
timed("closest (alpha-first)", lambda o, d: _scene_intersect(
    scene, o, d, t_inf), o, d)
timed("anyhit               ", lambda o, d: _scene_intersect_p(
    scene, o, d, jnp.full((N,), 100.0, jnp.float32)), o, d)

# --- fixed hit set for stage timings
hit = jax.jit(lambda o, d: _scene_intersect(scene, o, d, t_inf))(o, d)
hit = {k: jax.block_until_ready(v) for k, v in hit.items()}

timed("interaction build    ", lambda o, d: ia.make_interaction(
    sd, o, d, hit, scene.tri_attr)["p"], o, d)

it = jax.jit(lambda o, d: ia.make_interaction(
    sd, o, d, hit, scene.tri_attr))(o, d)
it = {k: jax.block_until_ready(v) for k, v in it.items()}

timed("gather_params (tex)  ", lambda u: bx.gather_params(
    sd, it["material"], it["uv"], mat_attr=scene.mat_attr,
    has_tex=scene.has_tex)["kd"], u1)

mp = jax.jit(lambda: bx.gather_params(
    sd, it["material"], it["uv"], mat_attr=scene.mat_attr,
    has_tex=scene.has_tex))()
mp = {k: jax.block_until_ready(v) for k, v in mp.items()}

light_idx = jnp.minimum((u1 * scene.n_lights).astype(jnp.int32),
                        scene.n_lights - 1)
timed("sample_li            ", lambda u: lt.sample_li(
    sd, take_rows(scene.light_attr, light_idx), it["p"], it["p_error"],
    it["ng"], u, light_set=scene.light_set)["wi"], u2)

wo = -d


def f_eval(u):
    wi = lt.sample_li(sd, take_rows(scene.light_attr, light_idx), it["p"],
                      it["p_error"], it["ng"], u,
                      light_set=scene.light_set)["wi"]
    reflect_ng = (pm.dot(wi, it["ng"]) * pm.dot(wo, it["ng"])) > 0.0
    f, pdf = bx.eval_f_pdf(mp, _to_local(it, wo), _to_local(it, wi),
                           reflect_ng, present=scene.mat_set)
    return f


timed("sample_li+eval_f_pdf ", f_eval, u2)

timed("sample_f             ", lambda u: bx.sample_f(
    mp, _to_local(it, wo), u,
    lambda wi_loc: (pm.dot(_to_world(it, wi_loc), it["ng"])
                    * pm.dot(wo, it["ng"])) > 0.0,
    present=scene.mat_set)["f"], u2)

timed("estimate_direct lonly", lambda u: estimate_direct(
    scene, PathConfig(), it, mp, None, u, light_idx, wo,
    bsdf_branch=False, pick_prob=1.0 / scene.n_lights), u2)

timed("spawn+emit           ", lambda d: (
    ia.spawn_ray(it["p"], it["p_error"], it["ng"], d)
    + ia.emitted_radiance(it, -d)), d)


# --- full wave with dim-salted draws (no CSE between sample_f calls)
def mkdraw():
    def draw(dim):
        return (u1 + np.float32(dim) * np.float32(0.37)) % 1.0

    def draw2(dim):
        return (u2 + np.float32(dim) * np.float32(0.37)) % 1.0
    return draw, draw2


for name, cfg in [("wave d1 ref   (salted)",
                   PathConfig(max_depth=1)),
                  ("wave d1 onesmp(salted)",
                   PathConfig(max_depth=1, mis_mode="onesample")),
                  ("wave d5 onesmp(salted)",
                   PathConfig(max_depth=5, mis_mode="onesample"))]:
    draw, draw2 = mkdraw()
    timed(name, lambda o, d, cfg=cfg: trace_wave(
        scene, cfg, draw, draw2, o, d)[0], o, d)
