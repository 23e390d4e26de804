"""Time the Sponza-class workload (BASELINE Config E) on the default device.

Usage: python tools/bench_sponza.py [spp] [depth] [WxH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,  # noqa
                                       TracedScene)
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
depth = int(sys.argv[2]) if len(sys.argv) > 2 else 5
res = tuple(int(v) for v in sys.argv[3].split("x")) if len(sys.argv) > 3 \
    else (1920, 1080)

t0 = time.time()
cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=res)
print(f"load {time.time()-t0:.1f}s tris={int(sd.p0.shape[0])}", flush=True)
t0 = time.time()
scene = TracedScene.create(sd)
print(f"bvh {time.time()-t0:.1f}s nodes={int(scene.bvh.nodes.shape[0])} "
      f"alpha={scene.has_alpha}", flush=True)

integ = PathIntegrator(PathConfig(max_depth=depth, mis_mode="onesample"), spp=spp)
t0 = time.time()
film = integ.render(cam, scene)
film.block_until_ready()
print(f"warmup(compile) {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
film = integ.render(cam, scene)
film.block_until_ready()
dt = time.time() - t0
rays = integ.last_ray_count
print(f"sponza {res[0]}x{res[1]} spp{spp} d{depth}: {dt:.2f}s "
      f"rays={rays/1e6:.1f}M -> {rays/dt/1e6:.2f} Mrays/s", flush=True)

from pathtracer_tpu.core.film import to_rgb8  # noqa: E402
from pathtracer_tpu.utils.image import write_png  # noqa: E402

write_png("/tmp/sponza_bench.png", to_rgb8(film))
print("wrote /tmp/sponza_bench.png", flush=True)
