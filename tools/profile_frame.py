"""Decompose one render_band frame: sobol setup / draws / raygen / trace /
splat, each timed as its own jitted program on the real band shape.

Usage: python tools/profile_frame.py
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
from pathtracer_tpu.core.camera import generate_rays  # noqa: E402
from pathtracer_tpu.core.film import sample_bounds, splat_tile  # noqa: E402
from pathtracer_tpu.core.filter import filter_f1d as mk_f1d  # noqa: E402
from pathtracer_tpu.integrator import (PathConfig, TracedScene,  # noqa
                                       trace_wave)
from pathtracer_tpu.ops import sobol as sb  # noqa: E402
from pathtracer_tpu.scene.mitsuba import load_mitsuba  # noqa: E402

REPS = 8
cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(640, 480))
scene = TracedScene.create(sd)
w, h = cam.resolution
f1d, radius = mk_f1d()
f1d = tuple(float(v) for v in f1d)
spp = 16
(x0, y0), (x1, y1) = sample_bounds(w, h, radius)
ws, hs = x1 - x0, y1 - y0
domain = sb.SobolDomain.create((x0, y0), (x1, y1), spp)
band = 203
xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y0 + band),
                     indexing="xy")
px = xs.ravel().astype(np.int32)
py = ys.ravel().astype(np.int32)
scramble_h, b_base_h = sb.pixel_statics(domain, px, np.minimum(py, y1 - 1))
px_d, py_d = jnp.asarray(px), jnp.asarray(py)
scramble = jnp.asarray(scramble_h)
b_base = jnp.asarray(b_base_h)
f_lo, f_hi, f_delta = sb.frame_statics(domain, 7)
inv_lo, inv_hi = sb.vdc_inv_rows(domain)
pack = sb.sm32_device()
r2c, cam_rot, cam_pos = cam.ray_params()
n = band * ws
pxf = px_d.astype(jnp.float32)
pyf = py_d.astype(jnp.float32)
print(f"backend={jax.default_backend()} wave={n}", flush=True)


def timed(name, fn, *args):
    def loop(args):
        def body(i, carry):
            return carry + jnp.sum(fn(*args)) * 0.0 + 0.0 * i
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    jl = jax.jit(loop)
    jl(args).block_until_ready()
    t0 = time.perf_counter()
    jl(args).block_until_ready()
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


# 1. sobol index + bits
def sobol_setup(b_base):
    lo, hi = sb.sobol_index(b_base, jnp.uint32(f_delta), jnp.uint32(f_lo),
                            jnp.uint32(f_hi), inv_lo, inv_hi)
    return lo.astype(jnp.float32) + hi.astype(jnp.float32)


timed("sobol_index", sobol_setup, b_base)

lo, hi = jax.jit(lambda b: sb.sobol_index(
    b, jnp.uint32(f_delta), jnp.uint32(f_lo), jnp.uint32(f_hi),
    inv_lo, inv_hi))(b_base)
# 2. one dim draw / one dim2 draw (static + dynamic dim)
timed("draw one dim (static)", lambda l, h: sb.sobol_sample_dim(
    l, h, 5, scramble, pack), lo, hi)
timed("draw 8 dims (static)", lambda l, h: sum(
    sb.sobol_sample_dim(l, h, 5 + k, scramble, pack) for k in range(8)),
    lo, hi)


def draws_dynamic(l, h, base):
    return sum(sb.sobol_sample_dim(l, h, base + k, scramble, pack)
               for k in range(8))


timed("draw 8 dims (dynamic)", draws_dynamic, lo, hi, jnp.int32(5))

# 3. raygen
s01 = jax.jit(lambda l, h: sb.sobol_sample_dim2(
    l, h, 0, jnp.zeros_like(scramble), pack))(lo, hi)
jx = jnp.clip(s01[..., 0] * domain.resolution + domain.p_min[0] - pxf,
              0.0, pm.ONE_MINUS_EPSILON)
jy = jnp.clip(s01[..., 1] * domain.resolution + domain.p_min[1] - pyf,
              0.0, pm.ONE_MINUS_EPSILON)
timed("raygen", lambda jx, jy: generate_rays(
    r2c, cam_rot, cam_pos, jnp.stack([pxf + jx, pyf + jy], -1))[1], jx, jy)

o, d = jax.jit(lambda jx, jy: generate_rays(
    r2c, cam_rot, cam_pos, jnp.stack([pxf + jx, pyf + jy], -1)))(jx, jy)

# 4. trace with REAL sobol draws vs constant draws
u1 = jnp.asarray(np.random.default_rng(0).random(n, np.float32))
u2 = jnp.stack([u1, u1], -1)
for md in (1, 3, 5):
    cfg = PathConfig(max_depth=md)
    timed(f"trace_wave d{md} const draws", lambda o, d: trace_wave(
        scene, cfg, lambda dim: u1, lambda dim: u2, o, d)[0], o, d)
    real_draw = lambda dim: sb.sobol_sample_dim(lo, hi, dim, scramble, pack)
    real_draw2 = lambda dim: sb.sobol_sample_dim2(lo, hi, dim, scramble,
                                                  pack)
    timed(f"trace_wave d{md} real draws", lambda o, d: trace_wave(
        scene, cfg, real_draw, real_draw2, o, d)[0], o, d)

# 5. splat
rad = jnp.abs(d)
timed("splat_tile", lambda r: splat_tile(
    r.reshape(band, ws, 3), jx.reshape(band, ws), jy.reshape(band, ws),
    (py_d < y1).reshape(band, ws), f1d, radius=radius), rad)
