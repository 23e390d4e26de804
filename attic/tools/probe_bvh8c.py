"""BVH8 round 3: does PREV-bounce step count predict THIS bounce's?

The oracle sort (by this traversal's own step count) gave 107 -> 36 ms;
the integrator can't know it ahead, but it can carry last bounce's
counts. Measures sum(chunk_max) and wall time for bounce-2 rays sorted
by bounce-1 steps, plus the dead-lane compaction win (t_max=0 lanes).

Usage: python tools/probe_bvh8c.py [n_rays]
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

f8s = jax.jit(lambda o, d, t: bvh8_intersect(table_d, o, d, t,
                                             count_steps=True))
hit_c = jax.block_until_ready(f8s(o_c, d_c, t_inf))
sc = np.asarray(hit_c["steps"])


def diffuse_bounce(hit, o_prev, d_prev, seed):
    """Cosine-ish random bounce from the hits (numpy host)."""
    r = np.random.default_rng(seed)
    p = np.asarray(o_prev) + np.asarray(hit["t"])[:, None] * np.asarray(d_prev)
    p = np.where(np.asarray(hit["valid"])[:, None], p, np.asarray(pos)[None])
    dirs = r.normal(size=(nn, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(p + 1e-3 * dirs), jnp.asarray(dirs)


o_b1, d_b1 = diffuse_bounce(hit_c, o_c, d_c, 1)
hit_b1 = jax.block_until_ready(f8s(o_b1, d_b1, t_inf))
s1 = np.asarray(hit_b1["steps"])
o_b2, d_b2 = diffuse_bounce(hit_b1, o_b1, d_b1, 2)
hit_b2 = jax.block_until_ready(f8s(o_b2, d_b2, t_inf))
s2 = np.asarray(hit_b2["steps"])
print(f"steps: cam mean={sc.mean():.1f} b1 mean={s1.mean():.1f} "
      f"b2 mean={s2.mean():.1f} corr(s1,s2)={np.corrcoef(s1, s2)[0, 1]:.3f}",
      flush=True)

csize = 8192
nch = nn // csize
for tag, key in (("raw", None), ("prev-steps", s1), ("oracle", s2)):
    srt = s2 if key is None else s2[np.argsort(key, kind="stable")]
    cm = srt[:nch * csize].reshape(nch, csize).max(1)
    print(f"  b2 chunk={csize} {tag:10s}: sum(chunk_max)={cm.sum():6.0f}",
          flush=True)


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)


f8c = jax.jit(lambda o, d, t: bvh8_intersect_chunked(table_d, o, d, t,
                                                     chunks=8))
perm = np.argsort(s1, kind="stable")
timed("b2 raw        chunks=8", f8c, o_b2, d_b2, t_inf)
timed("b2 prev-steps chunks=8", f8c,
      jnp.asarray(np.asarray(o_b2)[perm]),
      jnp.asarray(np.asarray(d_b2)[perm]), t_inf)

# device-side sort+permute+inverse cost (what the integrator would pay)
def dev_sorted(o, d, t, key):
    p = jnp.argsort(key)
    h = bvh8_intersect_chunked(table_d, o[p], d[p], t[p], chunks=8)
    inv = jnp.argsort(p)
    return {k: v[inv] for k, v in h.items()}


fds = jax.jit(dev_sorted)
timed("b2 dev sort+perm+inv  ", fds, o_b2, d_b2, t_inf, jnp.asarray(s1))

# dead-lane compaction: 60% dead (RR-killed), t_max=0
alive = rng.random(nn) < 0.4
t_dead = jnp.asarray(np.where(alive, np.inf, 0.0).astype(np.float32))
timed("b2 60%dead raw chunks=8", f8c, o_b2, d_b2, t_dead)
key_dead = np.where(alive, s1, -1)
timed("b2 60%dead dev-sorted  ", fds, o_b2, d_b2, t_dead,
      jnp.asarray(key_dead))
