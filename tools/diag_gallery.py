"""Gallery-artifact bisector (VERDICT r4 item 7): renders the Sponza
flagship at low res under isolating modes so the blocky stair-step
artifacts in gallery/sponza_1080p_64spp.png can be attributed to a
subsystem instead of guessed at.

Modes (pick one per process — the PTPU_NO_DIFF knob is read at trace
time, so it must not change inside a live process):
  preview   albedo x |n.v| raster pass (no lighting, no sampling):
            blocks here => texture/uv path
  base      path trace, production settings
  nodiff    path trace, PTPU_NO_DIFF=1 (all texture lookups level-0
            bilinear): blocks gone vs base => mip-width selection

Usage: python tools/diag_gallery.py [preview|base|nodiff] [W H spp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "base"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 480
H = int(sys.argv[3]) if len(sys.argv) > 3 else 270
spp = int(sys.argv[4]) if len(sys.argv) > 4 else 16

if mode == "nodiff":
    os.environ["PTPU_NO_DIFF"] = "1"

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from pathtracer_tpu.core.film import to_rgb8  # noqa: E402
from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,  # noqa
                                       TracedScene)
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402
from pathtracer_tpu.utils.image import write_png  # noqa: E402

cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(W, H))
scene = TracedScene.create(sd)
out = f"/tmp/diag_{mode}_{W}x{H}.png"
t0 = time.time()
if mode == "preview":
    from pathtracer_tpu.frontend.interactive import preview_frame
    img = np.asarray(preview_frame(cam, scene))
    write_png(out, (np.clip(img, 0, 1) * 255).astype(np.uint8))
else:
    integ = PathIntegrator(PathConfig(max_depth=5, mis_mode="onesample"),
                           spp=spp)
    film = integ.render(cam, scene)
    write_png(out, to_rgb8(film))
print(f"{mode}: {time.time()-t0:.1f}s -> {out}", flush=True)
