"""Narrow the Sponza 131k-ray render_band crash.

Known: render_band d5 PASSes at 32k (1080p rows=17) and 43k (640 rows=68),
CRASHES at 131k (1080p rows=68). Bare traversal and trace_wave d3 PASS at
131k. This script walks the remaining axes one fresh process at a time
(the worker must recover between crashes): total rays at fixed width,
width at fixed total, depth, differentials.

Usage: python tools/crash_matrix.py CASE
  CASE ∈ {wave_d5_131k, band640_131k, band1080_65k, band1080_34k_nodiff}
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

from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,  # noqa
                                       TracedScene, trace_wave)
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402

case = sys.argv[1]

cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
scene = TracedScene.create(sd)
rng = np.random.default_rng(0)
center = np.asarray(0.5 * (sd.p0.min(0) + sd.p0.max(0)))


def rays(n):
    o = np.tile(center[None, :] + np.array([0, 1, 0], np.float32),
                (n, 1)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


if case == "wave_d5_131k":
    # isolate DEPTH + DIFFERENTIALS: trace_wave alone at 131k, ramping
    # depth 4 -> 5 plain, then 5 with camera differentials. The process
    # dies at the first crashing variant; the line after the last PASS
    # names the culprit.
    n = 131072
    o, d = rays(n)
    u1 = jnp.asarray(rng.random(n, np.float32))
    u2 = jnp.asarray(rng.random((n, 2), np.float32))
    for depth, use_diff in [(4, False), (5, False), (5, True)]:
        rxd = (o + 1e-3, d) if use_diff else None
        ryd = (o + 2e-3, d) if use_diff else None
        cfg = PathConfig(max_depth=depth)
        f = jax.jit(lambda o, d, rxd=rxd, ryd=ryd, cfg=cfg: trace_wave(
            scene, cfg, lambda dim: u1, lambda dim: u2, o, d, rxd, ryd)[0])
        out = f(o, d)
        out.block_until_ready()
        print(f"wave d{depth} diff={use_diff} 131k: PASS", flush=True)

elif case == "band640_131k":
    # isolate TOTAL RAYS at narrow width: 640x480, rows=203 → 131k rays
    integ = PathIntegrator(PathConfig(max_depth=5), spp=1, band_rows=203)
    film = integ.render(cam, scene)
    film.block_until_ready()
    print("band640_131k: PASS", flush=True)

elif case == "band1080_65k":
    cam_r, _, _ = load_gltf("data/sponza_proc.glb", resolution=(1920, 1080))
    integ = PathIntegrator(PathConfig(max_depth=5), spp=1, band_rows=34)
    film = integ.render(cam_r, scene)
    film.block_until_ready()
    print("band1080_65k: PASS", flush=True)

else:
    raise SystemExit(f"unknown case {case}")
