"""Root-cause the >20k-ray BVH-wave TPU worker crash.

Runs progressively larger fused programs with the BVH traversal to find
which construct faults. Each stage prints PASS/size before moving on, so
the tail of the log identifies the crashing stage.

Usage: python tools/crash_repro.py [stage]
  stage: bare | wave | band  (default: all)
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
                                       TracedScene, trace_wave)
from pathtracer_tpu.scene.procedural import box_field_scene  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "all"
SIZES = [16384, 32768, 65536, 131072]

cam, sd = box_field_scene(resolution=(640, 480), n_boxes=1500)[:2]
scene = TracedScene.create(sd)
print(f"backend={jax.default_backend()} tris={int(sd.p0.shape[0])} "
      f"bvh_nodes={int(scene.bvh.bounds_min.shape[0])}", flush=True)

rng = np.random.default_rng(0)


def rays(n):
    o = np.tile(np.array([[0.0, 8.0, 30.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


if which in ("bare", "all"):
    # stage 1: standalone BVH traversal (round 1 said this was fine at 80k)
    for n in SIZES:
        o, d = rays(n)
        h = jax.jit(lambda o, d: bvh_intersect(
            scene.bvh, scene.data.p0, scene.data.p1, scene.data.p2,
            o, d, jnp.full((n,), jnp.inf, jnp.float32)))(o, d)
        h["t"].block_until_ready()
        print(f"bare traversal  n={n}: PASS", flush=True)

if which in ("wave", "all"):
    # stage 2: full bounce loop (trace_wave) with BVH
    for n in SIZES:
        o, d = rays(n)
        u1 = jnp.asarray(rng.random(n, np.float32))
        u2 = jnp.asarray(rng.random((n, 2), np.float32))
        cfg = PathConfig(max_depth=3)
        f = jax.jit(lambda o, d: trace_wave(
            scene, cfg, lambda dim: u1, lambda dim: u2, o, d)[0])
        out = f(o, d)
        out.block_until_ready()
        print(f"trace_wave d3   n={n}: PASS", flush=True)

if which in ("band", "all"):
    # stage 3: the real fused band renderer (raygen+sobol+trace+splat)
    for rows_target in [32, 64, 128, 256]:
        integ = PathIntegrator(PathConfig(max_depth=3), spp=1,
                               band_rows=rows_target)
        film = integ.render(cam, scene)
        film.block_until_ready()
        n = rows_target * 644
        print(f"render_band     n={n}: PASS", flush=True)

print("ALL STAGES PASS", flush=True)
