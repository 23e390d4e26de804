"""Measure BVH traversal cost structure on the Sponza-class scene.

Reports, for primary-like and incoherent ray waves:
  - wall time per bvh_intersect call and Mrays/s
  - while_loop iteration count (max node pops over the wave)
so per-iteration cost can be derived (the traversal optimization currency).

Usage: python tools/perf_traverse.py [n_rays]
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

from pathtracer_tpu.accel import bvh as bvh_mod  # noqa: E402
from pathtracer_tpu.integrator import TracedScene  # noqa: E402
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402
from pathtracer_tpu.core.camera import generate_rays  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072

t0 = time.time()
cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
print(f"load {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
scene = TracedScene.create(sd)
print(f"bvh {time.time()-t0:.1f}s nodes={int(scene.bvh.nodes.shape[0])}",
      flush=True)

rng = np.random.default_rng(0)


def count_iters(bvh, tri_pack, o, d, t_max):
    """bvh_intersect clone that also returns the while iteration count."""
    n = o.shape[0]
    inv_d = 1.0 / d
    neg = d < 0.0
    rows = jnp.arange(n)
    state = dict(
        stack=jnp.zeros((n, bvh_mod.STACK_DEPTH), jnp.int32),
        sp=jnp.ones((n,), jnp.int32), t_best=t_max,
        iters=jnp.int32(0),
    )

    def cond(st):
        return jnp.any(st["sp"] > 0)

    def body(st):
        live = st["sp"] > 0
        sp = jnp.where(live, st["sp"] - 1, st["sp"])
        node = st["stack"][rows, jnp.minimum(sp, bvh_mod.STACK_DEPTH - 1)]
        node = jnp.where(live, node, 0)
        nrow = bvh.nodes[node]
        near = bvh_mod._slab_test(nrow[:, 0:3], nrow[:, 3:6], o, inv_d,
                                  st["t_best"]) & live
        off = nrow[:, 6].astype(jnp.int32)
        meta = nrow[:, 7].astype(jnp.int32)
        n_p = meta >> 2
        axis = meta & 3
        is_leaf = n_p > 0
        t_best = st["t_best"]
        # skip actual tri tests; just clip t_best slightly to keep pruning
        push = near & ~is_leaf
        from pathtracer_tpu.ops.intersect import _take3
        dir_neg = _take3(neg, axis)
        child_near = jnp.where(dir_neg, off, node + 1)
        child_far = jnp.where(dir_neg, node + 1, off)
        stack = st["stack"]
        slot = jnp.minimum(sp, bvh_mod.STACK_DEPTH - 1)
        stack = stack.at[rows, slot].set(
            jnp.where(push, child_far, stack[rows, slot]))
        sp = jnp.where(push, sp + 1, sp)
        slot = jnp.minimum(sp, bvh_mod.STACK_DEPTH - 1)
        stack = stack.at[rows, slot].set(
            jnp.where(push, child_near, stack[rows, slot]))
        sp = jnp.where(push, sp + 1, sp)
        return dict(stack=stack, sp=sp, t_best=t_best,
                    iters=st["iters"] + 1)

    return jax.lax.while_loop(cond, body, state)["iters"]


center = np.asarray(0.5 * (sd.p0.min(0) + sd.p0.max(0)))


def coherent_rays(n):
    """Camera-like rays through the atrium."""
    px = rng.random((n, 2)).astype(np.float32) * np.asarray([640, 480],
                                                            np.float32)
    r2c, rot, pos = cam.ray_params()
    o, d = generate_rays(r2c, rot, pos, jnp.asarray(px))
    return o, d


def incoherent_rays(n):
    o = np.tile(center[None, :] + np.array([0, 1, 0], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o.astype(np.float32)), jnp.asarray(d)


for name, gen in [("coherent", coherent_rays), ("incoherent",
                                                incoherent_rays)]:
    o, d = gen(N)
    t_max = jnp.full((N,), jnp.inf, jnp.float32)

    fi = jax.jit(lambda o, d, t: count_iters(scene.bvh, scene.tri_pack,
                                             o, d, t))
    it = int(fi(o, d, t_max))
    print(f"{name}: interior-only iterations = {it}", flush=True)

    f = jax.jit(lambda o, d, t: bvh_mod.bvh_intersect(
        scene.bvh, scene.tri_pack, o, d, t))
    h = f(o, d, t_max)
    h["t"].block_until_ready()
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        h = f(o, d, t_max)
    h["t"].block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{name}: closest-hit {dt*1e3:.1f} ms  "
          f"{N/dt/1e6:.2f} Mrays/s  hit_frac="
          f"{float(h['valid'].mean()):.3f}", flush=True)

    fp = jax.jit(lambda o, d, t: bvh_mod.bvh_intersect(
        scene.bvh, scene.tri_pack, o, d, t, any_hit=True))
    occ = fp(o, d, t_max)
    occ.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        occ = fp(o, d, t_max)
    occ.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{name}: any-hit      {dt*1e3:.1f} ms  "
          f"{N/dt/1e6:.2f} Mrays/s", flush=True)
