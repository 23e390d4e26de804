"""BVH8 round 2: merged-leaf build, chunked loops, sort keys.

Questions:
  1. rows/steps after leaf merging
  2. chunk count sweep (independent loops overlap; per-chunk trip = max)
  3. does sorting (cell key vs oracle step key) cut chunked cost?

Usage: python tools/probe_bvh8b.py [n_rays]
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

from pathtracer_tpu.accel.bvh8 import (build_bvh8, bvh8_intersect,  # noqa
                                       bvh8_intersect_chunked)
from pathtracer_tpu.core.camera import generate_rays  # noqa: E402
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(256, 256))
t0 = time.time()
table, order, depth = build_bvh8(np.asarray(sd.p0), np.asarray(sd.p1),
                                 np.asarray(sd.p2))
print(f"bvh8 merged build {time.time()-t0:.1f}s rows={table.shape[0]} "
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

f8s = jax.jit(lambda o, d, t: bvh8_intersect(table_d, o, d, t,
                                             count_steps=True))
hit_c = jax.block_until_ready(f8s(o_c, d_c, t_inf))
sc = np.asarray(hit_c["steps"])
print(f"camera steps mean={sc.mean():.1f} max={sc.max()}", flush=True)

dn = np.asarray(d_c)
p_hit = np.asarray(o_c) + np.asarray(hit_c["t"])[:, None] * dn
p_hit = np.where(np.asarray(hit_c["valid"])[:, None], p_hit,
                 np.asarray(pos)[None, :])
dirs = rng.normal(size=(nn, 3)).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
o_b = jnp.asarray(p_hit + 1e-3 * dirs)
d_b = jnp.asarray(dirs)
hit_b = jax.block_until_ready(f8s(o_b, d_b, t_inf))
sb = np.asarray(hit_b["steps"])
print(f"bounce steps mean={sb.mean():.1f} max={sb.max()}", flush=True)

oct_b = ((dirs[:, 0] < 0) * 4 + (dirs[:, 1] < 0) * 2
         + (dirs[:, 2] < 0)).astype(np.int64)
lo, hi = p_hit.min(0), p_hit.max(0)
cell = np.clip((p_hit - lo) / np.maximum(hi - lo, 1e-9) * 8, 0,
               7).astype(np.int64)
key_cell = ((oct_b * 8 + cell[:, 0]) * 8 + cell[:, 1]) * 8 + cell[:, 2]

# what per-chunk max would each key give?
for csize in (4096, 8192, 16384):
    for tag, key in (("raw", None), ("cell", key_cell), ("oracle", sb)):
        srt = sb if key is None else sb[np.argsort(key, kind="stable")]
        nch = nn // csize
        cm = srt[:nch * csize].reshape(nch, csize).max(1)
        print(f"  chunk={csize:5d} {tag:6s}: sum(chunk_max)="
              f"{cm.sum():6.0f} (vs {nch}x{sb.max()}="
              f"{nch * sb.max()})", flush=True)


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)


for ch in (1, 4, 8, 16):
    f = jax.jit(lambda o, d, t, ch=ch: bvh8_intersect_chunked(
        table_d, o, d, t, chunks=ch))
    timed(f"bounce raw    chunks={ch:2d}", f, o_b, d_b, t_inf)
    perm = np.argsort(key_cell, kind="stable")
    timed(f"bounce cell   chunks={ch:2d}", f,
          jnp.asarray(np.asarray(o_b)[perm]),
          jnp.asarray(np.asarray(d_b)[perm]), t_inf)
    perm = np.argsort(sb, kind="stable")
    timed(f"bounce oracle chunks={ch:2d}", f,
          jnp.asarray(np.asarray(o_b)[perm]),
          jnp.asarray(np.asarray(d_b)[perm]), t_inf)
