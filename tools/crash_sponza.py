"""Bisect the Sponza-class TPU worker crash.

The 1080p Sponza bench (tools/bench_sponza.py) dies with "TPU worker
process crashed or restarted" inside the first render_band. This script
runs the workload's constructs in isolation, smallest first, printing
PASS after each so the crashing stage is the line after the last PASS.

Usage: python tools/crash_sponza.py [stage]
  stage: bare | alpha | anyhit | wave | band  (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtracer_tpu.accel.bvh import bvh_intersect  # noqa: E402
from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,  # noqa
                                       TracedScene, _scene_intersect,
                                       _scene_intersect_p, trace_wave)
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "all"
SIZES = [4096, 16384, 65536, 131072]

cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
scene = TracedScene.create(sd)
print(f"backend={jax.default_backend()} tris={int(sd.p0.shape[0])} "
      f"bvh_nodes={int(scene.bvh.bounds_min.shape[0])} "
      f"alpha={scene.has_alpha}", flush=True)

rng = np.random.default_rng(0)
center = np.asarray(0.5 * (sd.p0.min(0) + sd.p0.max(0)))


def rays(n):
    o = np.tile(center[None, :] + np.array([0, 1, 0], np.float32),
                (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


if which in ("bare", "all"):
    for n in SIZES:
        o, d = rays(n)
        h = jax.jit(lambda o, d: bvh_intersect(
            scene.bvh, scene.tri_pack, o, d,
            jnp.full((o.shape[0],), jnp.inf, jnp.float32)))(o, d)
        h["t"].block_until_ready()
        print(f"bare traversal   n={n}: PASS", flush=True)

if which in ("alpha", "all"):
    for n in SIZES:
        o, d = rays(n)
        h = jax.jit(lambda o, d: _scene_intersect(
            scene, o, d, jnp.full((o.shape[0],), jnp.inf, jnp.float32)))(o, d)
        h["t"].block_until_ready()
        print(f"alpha closest    n={n}: PASS", flush=True)

if which in ("anyhit", "all"):
    for n in SIZES:
        o, d = rays(n)
        occ = jax.jit(lambda o, d: _scene_intersect_p(
            scene, o, d, jnp.full((o.shape[0],), 100.0, jnp.float32)))(o, d)
        occ.block_until_ready()
        print(f"alpha anyhit     n={n}: PASS", flush=True)

if which in ("wave", "all"):
    for n in SIZES:
        o, d = rays(n)
        u1 = jnp.asarray(rng.random(n, np.float32))
        u2 = jnp.asarray(rng.random((n, 2), np.float32))
        cfg = PathConfig(max_depth=3)
        f = jax.jit(lambda o, d: trace_wave(
            scene, cfg, lambda dim: u1, lambda dim: u2, o, d)[0])
        out = f(o, d)
        out.block_until_ready()
        print(f"trace_wave d3    n={n}: PASS", flush=True)

if which in ("band", "all"):
    # the 1080p bench crash wave: 1924-wide bands (131k rays) at d5 with
    # ray differentials; ramp width and rows separately
    for res, rows_target in [((640, 480), 68), ((1920, 1080), 17),
                             ((1920, 1080), 68)]:
        cam_r, sd_r, _ = load_gltf("data/sponza_proc.glb", resolution=res)
        integ = PathIntegrator(PathConfig(max_depth=5), spp=1,
                               band_rows=rows_target)
        film = integ.render(cam_r, scene)
        film.block_until_ready()
        print(f"render_band {res[0]}x{res[1]} rows={rows_target} "
              f"(~{res[0]*rows_target//1000}k rays): PASS", flush=True)

print("ALL STAGES PASS", flush=True)
