"""Sponza bounce-cost ledger: where do the 29 s/band actually go?

Times, on 65k incoherent rays (clean process, no other CPU/TPU load):
  closest / anyhit traversals (alpha-split path)
  trace_wave depth 0 (intersect + Le)
  trace_wave depth 1: ref MIS / onesample MIS / NEE compiled out
Differences isolate: per-bounce shading+NEE cost vs traversal cost vs the
MIS re-intersection, so optimization goes where the milliseconds are.

Usage: python tools/profile_sponza.py [n_rays]
"""

import dataclasses
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

from pathtracer_tpu.integrator import (PathConfig, TracedScene,  # noqa
                                       _scene_intersect, _scene_intersect_p,
                                       trace_wave)
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
scene = TracedScene.create(sd)
print(f"scene ready split={scene.bvh_alpha is not None} "
      f"n_lights={scene.n_lights} env={scene.has_env}", flush=True)

rng = np.random.default_rng(0)
center = np.asarray(0.5 * (np.asarray(sd.p0).min(0)
                           + np.asarray(sd.p0).max(0)))
o = jnp.asarray(np.tile(center[None, :] + np.array([0, 1, 0], np.float32),
                        (N, 1)).astype(np.float32))
dn = rng.normal(size=(N, 3)).astype(np.float32)
dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
d = jnp.asarray(dn)
t_inf = jnp.full((N,), np.inf, jnp.float32)
u1 = jnp.asarray(rng.random(N).astype(np.float32))
u2 = jnp.asarray(rng.random((N, 2)).astype(np.float32))


def timed(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:8.1f} ms", flush=True)
    return dt


timed("closest-hit (split)      ",
      jax.jit(lambda o, d: _scene_intersect(scene, o, d, t_inf)), o, d)
timed("any-hit     (split)      ",
      jax.jit(lambda o, d: _scene_intersect_p(
          scene, o, d, jnp.full((N,), 100.0, jnp.float32))), o, d)

from pathtracer_tpu.integrator import _alpha_set_intersect, _main_closest  # noqa
if scene.split_alpha:
    timed("alpha-set closest        ",
          jax.jit(lambda o, d: _alpha_set_intersect(scene, o, d, t_inf)),
          o, d)
if scene.bw_rows is not None:
    timed("bw main closest (chunk4) ",
          jax.jit(lambda o, d: _main_closest(scene, o, d, t_inf)), o, d)
    from pathtracer_tpu.accel.bvhw import bvhw_intersect_chunked
    for ch in (1, 8, 16):
        timed(f"bw main closest (chunk{ch:<2d})",
              jax.jit(lambda o, d, ch=ch: bvhw_intersect_chunked(
                  scene.bw_rows, o, d, t_inf, chunks=ch)), o, d)
    timed("bw main anyhit           ",
          jax.jit(lambda o, d: bvhw_intersect_chunked(
              scene.bw_rows, o, d, jnp.full((N,), 100.0, jnp.float32),
              any_hit=True)), o, d)


def wave(cfg, sc):
    return jax.jit(lambda o, d: trace_wave(
        sc, cfg, lambda dim: u1, lambda dim: u2, o, d)[0])


t0 = timed("wave d0                  ", wave(PathConfig(max_depth=0), scene),
           o, d)
t1r = timed("wave d1 ref              ",
            wave(PathConfig(max_depth=1), scene), o, d)
t1o = timed("wave d1 onesample        ",
            wave(PathConfig(max_depth=1, mis_mode="onesample"), scene), o, d)
scene_nl = dataclasses.replace(scene, n_lights=0)
t1n = timed("wave d1 no-NEE           ",
            wave(PathConfig(max_depth=1), scene_nl), o, d)
t3o = timed("wave d3 onesample        ",
            wave(PathConfig(max_depth=3, mis_mode="onesample"), scene), o, d)

print(f"\nbounce cost:   ref {1e3*(t1r-t0):.1f} ms  "
      f"onesample {1e3*(t1o-t0):.1f} ms  no-NEE {1e3*(t1n-t0):.1f} ms",
      flush=True)
print(f"marginal bounce (d3-d1)/2 onesample: {1e3*(t3o-t1o)/2:.1f} ms",
      flush=True)
