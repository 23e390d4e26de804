"""Measure per-ray traversal step counts on Sponza: camera vs bounce rays,
and the effect of ray SORTING on per-chunk max trip counts.

The lockstep while_loop runs to the slowest lane of each chunk, so cost =
sum over chunks of (chunk max steps) x lanes x row width. Sorting rays so
lanes in a chunk finish together converts "max" toward "mean".

Usage: python tools/probe_steps.py [n_rays]
"""

import sys

sys.exit("RETIRED: this probe targets the bvh2 unified-row layout, which\n"
         "TracedScene no longer builds (superseded by accel/bvhw BVH32).\n"
         "Its measurements are recorded in PLAN.md; use tools/tpu_session.py\n"
         "for current-layout traversal timings.")


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

from pathtracer_tpu.accel.bvh2 import bvh2_intersect  # noqa: E402
from pathtracer_tpu.core.camera import generate_rays  # noqa: E402
from pathtracer_tpu.integrator import TracedScene  # noqa: E402
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(256, 256))
scene = TracedScene.create(sd)
rng = np.random.default_rng(0)


def stats(name, steps, key=None):
    s = np.asarray(steps)
    line = (f"{name}: mean={s.mean():7.1f} med={np.median(s):6.0f} "
            f"p90={np.percentile(s, 90):6.0f} max={s.max():6.0f}")
    for csize in (8192, 16384):
        for tag, order in (("raw", np.arange(len(s))),
                           ("sorted", np.argsort(key if key is not None
                                                 else s, kind="stable"))):
            ss = s[order]
            nc = len(ss) // csize
            cm = ss[:nc * csize].reshape(nc, csize).max(axis=1)
            line += f"  [{tag} c{csize//1024}k: {cm.mean():7.1f}]"
    print(line, flush=True)


count = jax.jit(lambda o, d, t: bvh2_intersect(
    scene.u_rows, scene.u_root, o, d, t, count_steps=True))

# camera rays (coherent)
side = int(np.sqrt(N))
xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="xy")
p_film = jnp.asarray(
    np.stack([xs.ravel() * 256.0 / side, ys.ravel() * 256.0 / side],
             axis=-1).astype(np.float32))
r2c, rot, pos = cam.ray_params()
o_c, d_c = generate_rays(r2c, rot, pos, p_film)
t_inf = jnp.full((side * side,), np.inf, jnp.float32)
hit_c = jax.block_until_ready(count(o_c, d_c, t_inf))
# octant+morton-ish sort key for direction coherence
dn = np.asarray(d_c)
octant = ((dn[:, 0] < 0) * 4 + (dn[:, 1] < 0) * 2 + (dn[:, 2] < 0)).astype(
    np.int64)
stats("camera ", hit_c["steps"], key=octant)

# bounce-like rays: origins at camera hit points, cosine-ish random dirs
valid = np.asarray(hit_c["valid"])
p_hit = np.asarray(o_c) + np.asarray(hit_c["t"])[:, None] * dn
p_hit = np.where(valid[:, None], p_hit, np.asarray(pos)[None, :])
dirs = rng.normal(size=(len(p_hit), 3)).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
o_b = jnp.asarray(p_hit + 1e-3 * dirs)
d_b = jnp.asarray(dirs)
hit_b = jax.block_until_ready(count(o_b, d_b, t_inf))
oct_b = ((dirs[:, 0] < 0) * 4 + (dirs[:, 1] < 0) * 2
         + (dirs[:, 2] < 0)).astype(np.int64)
# finer key: octant then quantized origin (morton-lite: 8 cells/axis)
lo, hi = p_hit.min(0), p_hit.max(0)
cell = np.clip(((p_hit - lo) / np.maximum(hi - lo, 1e-9) * 8), 0,
               7).astype(np.int64)
key_b = (((octant := oct_b) * 8 + cell[:, 0]) * 8 + cell[:, 1]) * 8 \
    + cell[:, 2]
stats("bounce ", hit_b["steps"], key=key_b)
stats("bounce/octant-only", hit_b["steps"], key=oct_b)

# timing check: does sorting actually speed the traversal?
plain = jax.jit(lambda o, d, t: bvh2_intersect(
    scene.u_rows, scene.u_root, o, d, t))


def timed(name, o, d):
    out = jax.block_until_ready(plain(o, d, t_inf))
    t0 = time.perf_counter()
    for _ in range(3):
        out = plain(o, d, t_inf)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:7.1f} ms", flush=True)


timed("time bounce raw    ", o_b, d_b)
perm = np.argsort(key_b, kind="stable")
timed("time bounce sorted ", jnp.asarray(np.asarray(o_b)[perm]),
      jnp.asarray(np.asarray(d_b)[perm]))
timed("time camera        ", o_c, d_c)
