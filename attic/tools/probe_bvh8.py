"""BVH8 vs binary unified-row traversal on Sponza (TPU timing + steps).

Usage: python tools/probe_bvh8.py [n_rays]
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
from pathtracer_tpu.accel.bvh8 import build_bvh8, bvh8_intersect  # noqa
from pathtracer_tpu.core.camera import generate_rays  # noqa: E402
from pathtracer_tpu.integrator import TracedScene  # noqa: E402
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(256, 256))
scene = TracedScene.create(sd)

t0 = time.time()
table, order, depth = build_bvh8(np.asarray(sd.p0), np.asarray(sd.p1),
                                 np.asarray(sd.p2))
print(f"bvh8 build {time.time()-t0:.1f}s rows={table.shape[0]} "
      f"depth={depth}", flush=True)
table_d = jnp.asarray(table)

rng = np.random.default_rng(0)
side = int(np.sqrt(N))
xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="xy")
p_film = jnp.asarray(
    np.stack([xs.ravel() * 256.0 / side, ys.ravel() * 256.0 / side],
             axis=-1).astype(np.float32))
r2c, rot, pos = cam.ray_params()
o_c, d_c = generate_rays(r2c, rot, pos, p_film)
nn = side * side
t_inf = jnp.full((nn,), np.inf, jnp.float32)

f8 = jax.jit(lambda o, d, t: bvh8_intersect(table_d, o, d, t))
f8s = jax.jit(lambda o, d, t: bvh8_intersect(table_d, o, d, t,
                                             count_steps=True))
f2 = jax.jit(lambda o, d, t: bvh2_intersect(scene.u_rows, scene.u_root,
                                            o, d, t))
f8a = jax.jit(lambda o, d, t: bvh8_intersect(table_d, o, d, t,
                                             any_hit=True))
f2a = jax.jit(lambda o, d, t: bvh2_intersect(scene.u_rows, scene.u_root,
                                             o, d, t, any_hit=True))


def timed(name, fn, o, d, t):
    out = jax.block_until_ready(fn(o, d, t))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(o, d, t)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)
    return out


# correctness vs bvh2 on real scene geometry first (camera rays)
h8 = jax.block_until_ready(f8(o_c, d_c, t_inf))
h2 = jax.block_until_ready(f2(o_c, d_c, t_inf))
v8, v2 = np.asarray(h8["valid"]), np.asarray(h2["valid"])
same_v = (v8 == v2).mean()
tt8, tt2 = np.asarray(h8["t"]), np.asarray(h2["t"])
both = v8 & v2
dt_rel = np.abs(tt8[both] - tt2[both]) / np.maximum(tt2[both], 1e-6)
print(f"camera agree valid={same_v:.6f} t_rel_max={dt_rel.max():.2e} "
      f"(NOTE: tri order differs between builds; t must agree)", flush=True)

hs = jax.block_until_ready(f8s(o_c, d_c, t_inf))
s = np.asarray(hs["steps"])
print(f"bvh8 camera steps mean={s.mean():.1f} med={np.median(s):.0f} "
      f"max={s.max()}", flush=True)

timed("bvh2 camera closest", f2, o_c, d_c, t_inf)
timed("bvh8 camera closest", f8, o_c, d_c, t_inf)

# bounce-like rays
dn = np.asarray(d_c)
p_hit = np.asarray(o_c) + np.asarray(h8["t"])[:, None] * dn
p_hit = np.where(v8[:, None], p_hit, np.asarray(pos)[None, :])
dirs = rng.normal(size=(nn, 3)).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
o_b = jnp.asarray(p_hit + 1e-3 * dirs)
d_b = jnp.asarray(dirs)

hbs = jax.block_until_ready(f8s(o_b, d_b, t_inf))
s = np.asarray(hbs["steps"])
print(f"bvh8 bounce steps mean={s.mean():.1f} med={np.median(s):.0f} "
      f"max={s.max()}", flush=True)

timed("bvh2 bounce closest", f2, o_b, d_b, t_inf)
timed("bvh8 bounce closest", f8, o_b, d_b, t_inf)

# sorted bounce rays (octant + origin cell)
oct_b = ((dirs[:, 0] < 0) * 4 + (dirs[:, 1] < 0) * 2
         + (dirs[:, 2] < 0)).astype(np.int64)
lo, hi = p_hit.min(0), p_hit.max(0)
cell = np.clip((p_hit - lo) / np.maximum(hi - lo, 1e-9) * 8, 0,
               7).astype(np.int64)
key = ((oct_b * 8 + cell[:, 0]) * 8 + cell[:, 1]) * 8 + cell[:, 2]
perm = np.argsort(key, kind="stable")
o_bs = jnp.asarray(np.asarray(o_b)[perm])
d_bs = jnp.asarray(np.asarray(d_b)[perm])
timed("bvh8 bounce sorted ", f8, o_bs, d_bs, t_inf)
timed("bvh2 bounce sorted ", f2, o_bs, d_bs, t_inf)

# shadow anyhit toward a fixed light point (finite t_max)
light_p = np.asarray(0.5 * (lo + hi) + np.array([0, (hi - lo)[1] * 0.45, 0],
                                                np.float32))
sd_dir = light_p[None, :] - p_hit
dist = np.linalg.norm(sd_dir, axis=-1, keepdims=True)
sd_dir = (sd_dir / np.maximum(dist, 1e-9)).astype(np.float32)
t_sh = jnp.asarray((dist[:, 0] * 0.999).astype(np.float32))
timed("bvh2 shadow anyhit ", f2a, jnp.asarray(p_hit + 1e-3 * sd_dir),
      jnp.asarray(sd_dir), t_sh)
timed("bvh8 shadow anyhit ", f8a, jnp.asarray(p_hit + 1e-3 * sd_dir),
      jnp.asarray(sd_dir), t_sh)
perm2 = np.argsort(((cell[:, 0] * 8 + cell[:, 1]) * 8 + cell[:, 2]),
                   kind="stable")
timed("bvh8 shadow sorted ", f8a,
      jnp.asarray((p_hit + 1e-3 * sd_dir)[perm2]),
      jnp.asarray(sd_dir[perm2]), jnp.asarray(np.asarray(t_sh)[perm2]))
