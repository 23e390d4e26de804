"""Per-tree traversal ledger: main (opaque) vs alpha tree, two ray sets.

Determines which tree burns the 1950 ms closest / 2400 ms shadow cost on
65k bush-origin rays, and how camera-coherent rays compare.

Usage: python tools/profile_trees.py [n_rays]
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

from pathtracer_tpu.accel.bvh import bvh_intersect  # noqa: E402
from pathtracer_tpu.core.camera import generate_rays  # noqa: E402
from pathtracer_tpu.integrator import TracedScene  # noqa: E402
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
scene = TracedScene.create(sd)
print(f"main nodes={int(scene.bvh.nodes.shape[0])} "
      f"alpha nodes={int(scene.bvh_alpha.nodes.shape[0])}", flush=True)

rng = np.random.default_rng(0)
center = np.asarray(0.5 * (np.asarray(sd.p0).min(0)
                           + np.asarray(sd.p0).max(0)))


def bush_rays(n):
    o = np.tile(center[None, :] + np.array([0, 1, 0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o.astype(np.float32)), jnp.asarray(d)


def cam_rays(n):
    px = rng.random((n, 2)).astype(np.float32) * np.asarray(
        [640, 480], np.float32)
    r2c, rot, pos = cam.ray_params()
    return generate_rays(r2c, rot, pos, jnp.asarray(px))


def timed(name, fn, *args, reps=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:8.1f} ms", flush=True)


t_inf = jnp.full((N,), jnp.inf, jnp.float32)
t_100 = jnp.full((N,), 100.0, jnp.float32)

for rname, gen in [("bush", bush_rays), ("cam ", cam_rays)]:
    o, d = gen(N)
    timed(f"{rname} main  closest     ", lambda o, d: bvh_intersect(
        scene.bvh, scene.tri_pack, o, d, t_inf)["t"], o, d)
    timed(f"{rname} alpha closest     ", lambda o, d: bvh_intersect(
        scene.bvh_alpha, scene.tri_pack, o, d, t_inf,
        alpha_pack=scene.alpha_pack,
        alpha_texels=scene.alpha_texels)["t"], o, d)
    timed(f"{rname} alpha closest noat", lambda o, d: bvh_intersect(
        scene.bvh_alpha, scene.tri_pack, o, d, t_inf)["t"], o, d)
    timed(f"{rname} main  anyhit      ", lambda o, d: bvh_intersect(
        scene.bvh, scene.tri_pack, o, d, t_100, any_hit=True), o, d)
    timed(f"{rname} alpha anyhit      ", lambda o, d: bvh_intersect(
        scene.bvh_alpha, scene.tri_pack, o, d, t_100, any_hit=True,
        alpha_pack=scene.alpha_pack,
        alpha_texels=scene.alpha_texels), o, d)
