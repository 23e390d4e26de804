"""Decompose the cornell bench: full render vs render_band vs trace_wave.

Usage: python tools/profile_render.py
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

from pathtracer_tpu.integrator import PathConfig, PathIntegrator  # noqa: E402
from pathtracer_tpu.scene.mitsuba import load_mitsuba  # noqa: E402

cam, scene, _ = load_mitsuba("data/cornell-box.xml", resolution=(640, 480))
integ = PathIntegrator(PathConfig(max_depth=5), spp=16)

print(f"backend={jax.default_backend()}", flush=True)

# full render timing (2nd run, compiled)
film = integ.render(cam, scene)
film.block_until_ready()
t0 = time.perf_counter()
film = integ.render(cam, scene)
film.block_until_ready()
dt_full = time.perf_counter() - t0
rays = integ.last_ray_count
print(f"full render: {dt_full*1e3:8.1f} ms  rays={rays/1e6:.1f}M  "
      f"=> {rays/dt_full/1e6:.1f} Mrays/s", flush=True)

# render() again but with per-band sync removed cost estimate: time the
# band dispatch loop without float() syncs by calling render_band directly
from pathtracer_tpu.core.film import film_pad_new, sample_bounds  # noqa
from pathtracer_tpu.core.filter import filter_f1d as mk_f1d  # noqa
from pathtracer_tpu.integrator import TracedScene, render_band  # noqa
from pathtracer_tpu.core import math as pm  # noqa
from pathtracer_tpu.ops import sobol as sb  # noqa

ts = TracedScene.create(scene)
w, h = cam.resolution
f1d, radius = mk_f1d()
f1d = tuple(float(v) for v in f1d)
spp = 16
(x0, y0), (x1, y1) = sample_bounds(w, h, radius)
ws, hs = x1 - x0, y1 - y0
domain = sb.SobolDomain.create((x0, y0), (x1, y1), spp)
band = max(1, (1 << 17) // ws)
band = min(band, hs)
n_bands = -(-hs // band)
inv_lo, inv_hi = sb.vdc_inv_rows(domain)
sobol_pack = sb.sm32_device()
r2c, cam_rot, cam_pos = cam.ray_params()

bands = []
for bi in range(n_bands):
    by0 = y0 + bi * band
    xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(by0, by0 + band),
                         indexing="xy")
    px = xs.ravel().astype(np.int32)
    py = ys.ravel().astype(np.int32)
    scr, b_base = sb.pixel_statics(domain, px, np.minimum(py, y1 - 1))
    bands.append((by0, jnp.asarray(px), jnp.asarray(py),
                  jnp.asarray(py < y1), jnp.asarray(b_base),
                  jnp.asarray(scr)))

frame_lo = np.zeros(spp, np.uint32)
frame_hi = np.zeros(spp, np.uint32)
frame_delta = np.zeros(spp, np.uint32)
for i in range(spp):
    frame_lo[i], frame_hi[i], frame_delta[i] = sb.frame_statics(domain, i)


def run_bands(n_frames):
    film_pad = film_pad_new(w, h, extra_rows=band)
    tot = 0.0
    for by0, px, py, valid, b_base, scr in bands:
        film_pad, r, _, _ = render_band(
            ts, integ.cfg, n_frames, (band, ws), valid, film_pad,
            jnp.int32(x0), jnp.int32(by0), px, py, b_base, scr,
            jnp.asarray(frame_lo), jnp.asarray(frame_hi),
            jnp.asarray(frame_delta), jnp.int32(0), inv_lo, inv_hi,
            r2c, cam_rot, cam_pos, f1d, sobol_pack,
            jnp.float32(domain.resolution), jnp.float32(domain.p_min[0]),
            jnp.float32(domain.p_min[1]),
            total_spp_log2=pm.log2_int(spp), filter_radius=radius)
        tot += 0  # no sync
    return film_pad, r


for n_frames in (1, 16):
    fp, r = run_bands(n_frames)
    fp.block_until_ready()
    t0 = time.perf_counter()
    fp, r = run_bands(n_frames)
    fp.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"render_band x{n_bands} bands, {n_frames:2d} frames: "
          f"{dt*1e3:8.1f} ms", flush=True)

print(f"bands={n_bands} band_rows={band} ws={ws} wave={band*ws}", flush=True)
