"""Per-component TPU timing of one integrator bounce (cornell workload).

Times each stage of the wavefront bounce body at a given wave size by
running it REPS times inside one jitted fori_loop (amortizes the ~2.5 ms
axon dispatch latency). Prints ms per call per stage.

Usage: python tools/profile_bounce.py [n_rays]
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

from pathtracer_tpu.integrator import (PathConfig, TracedScene,  # noqa: E402
                                       estimate_direct, _scene_intersect,
                                       _scene_intersect_p, _to_local,
                                       _to_world)
from pathtracer_tpu.ops import bsdf as bx  # noqa: E402
from pathtracer_tpu.ops import interaction as ia  # noqa: E402
from pathtracer_tpu.scene.mitsuba import load_mitsuba  # noqa: E402
from pathtracer_tpu.core import math as pm  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
REPS = 16

cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(640, 480))
scene = TracedScene.create(sd)
cfg = PathConfig()
print(f"backend={jax.default_backend()} n_rays={N} "
      f"bvh={'yes' if scene.bvh is not None else 'no'} "
      f"pallas={scene.use_pallas}", flush=True)

rng = np.random.default_rng(0)
o_h = np.zeros((N, 3), np.float32)
o_h[:] = [0.0, 1.0, 3.5]
d_h = rng.normal(size=(N, 3)).astype(np.float32)
d_h /= np.linalg.norm(d_h, axis=-1, keepdims=True)
o = jnp.asarray(o_h)
d = jnp.asarray(d_h)
u2 = jnp.asarray(rng.random((N, 2), np.float32))
u1 = jnp.asarray(rng.random((N,), np.float32))


def timed(name, fn, *args):
    """fn must return an array; runs REPS times chained via a carry."""
    def loop(args):
        def body(i, carry):
            out = fn(*args)
            # fold output into a scalar to chain iterations w/o DCE
            return carry + jnp.sum(out) * 0.0 + i * 0.0
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    jl = jax.jit(loop)
    r = jl(args)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = jl(args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:32s} {dt:8.2f} ms", flush=True)
    return dt


tmax = jnp.full((N,), jnp.inf, jnp.float32)

# stage 1: closest hit
timed("intersect_closest", lambda o, d: _scene_intersect(
    scene, o, d, tmax)["t"], o, d)

# stage 2: shadow any-hit
timed("intersect_shadow", lambda o, d: _scene_intersect_p(
    scene, o, d, jnp.full((N,), 1.0, jnp.float32)).astype(jnp.float32), o, d)

hit = jax.jit(lambda o, d: _scene_intersect(scene, o, d, tmax))(o, d)
hit = jax.tree.map(lambda x: x.block_until_ready(), hit)

# stage 3: interaction build (gathers + frame math)
timed("make_interaction", lambda o, d: ia.make_interaction(
    scene.data, o, d, hit)["p"], o, d)

it = jax.jit(lambda o, d: ia.make_interaction(scene.data, o, d, hit))(o, d)
it = jax.tree.map(lambda x: x.block_until_ready(), it)

# stage 4: material param gather
timed("gather_params", lambda u: bx.gather_params(
    scene.data, it["material"], it["uv"])["kd"], u1)

mp = jax.jit(lambda: bx.gather_params(scene.data, it["material"],
                                      it["uv"]))()
mp = jax.tree.map(lambda x: x.block_until_ready(), mp)

# stage 5: one sample_f
wo = -d


def do_sample(u):
    wo_l = _to_local(it, wo)
    bs = bx.sample_f(mp, wo_l, u,
                     lambda wi_loc: (pm.dot(_to_world(it, wi_loc), it["ng"])
                                     * pm.dot(wo, it["ng"])) > 0.0,
                     present=scene.mat_set)
    return bs["f"]


timed("bsdf_sample_f", do_sample, u2)

# stage 6: full estimate_direct (includes shadow ray + MIS re-intersect)
light_idx = jnp.zeros((N,), jnp.int32)
timed("estimate_direct", lambda u2a, u2b: estimate_direct(
    scene, cfg, it, mp, u2a, u2b, light_idx, wo), u2, u2)

# stage 7: the whole bounce body via trace_wave at depth 1 vs 0
from pathtracer_tpu.integrator import trace_wave  # noqa: E402


def wave_depth(md):
    cfgd = PathConfig(max_depth=md)
    draw = lambda dim: u1
    draw2 = lambda dim: u2
    return lambda o, d: trace_wave(scene, cfgd, draw, draw2, o, d)[0]


t0 = timed("trace_wave depth0", wave_depth(0), o, d)
t1 = timed("trace_wave depth1", wave_depth(1), o, d)
t2 = timed("trace_wave depth2", wave_depth(2), o, d)
print(f"marginal bounce cost: d1-d0={t1-t0:.2f} ms  d2-d1={t2-t1:.2f} ms",
      flush=True)
