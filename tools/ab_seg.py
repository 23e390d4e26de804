"""Quick A/B of the segmented Sponza path under the current env knobs.

Renders sponza_proc.glb at 480x270, 1 spp, depth 5 (the tpu_session e2e
small leg) twice — warmup(compile) + timed — and appends the result to
TPU_SESSION.json keyed by the knob string, so variants are comparable:

  PTPU_SEG_PACK_BOUNDARY=0 PTPU_SEG_SHARED_MID=0 python tools/ab_seg.py
  PTPU_WAVE_SORT_MODE=2 python tools/ab_seg.py
  python tools/ab_seg.py 1920 1080        # optional resolution override

ONE TPU process at a time (PLAN.md gotchas).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_BANK = "/root/repo/TPU_SESSION.json"
_ON_CPU = "cpu" in os.environ.get("JAX_PLATFORMS", "").lower()
if _ON_CPU:
    _BANK = "/root/repo/TPU_SESSION_cpu_smoke.json"

res = ((int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) >= 3
       else (480, 270))

knobs = {k: v for k, v in os.environ.items() if k.startswith("PTPU_")}
tag = ",".join(f"{k[5:].lower()}={v}" for k, v in sorted(knobs.items())) \
    or "defaults"

from pathtracer_tpu.integrator import PathConfig, PathIntegrator, TracedScene
from pathtracer_tpu.scene.gltf import load_gltf

t0 = time.time()
cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=res)
scene = TracedScene.create(sd)
print(f"[ab] scene {time.time()-t0:.1f}s  knobs: {tag}", flush=True)

integ = PathIntegrator(PathConfig(max_depth=5, mis_mode="onesample"), spp=1)
t0 = time.time()
film = integ.render(cam, scene)
film.block_until_ready()
print(f"[ab] warmup(compile) {time.time()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
film = integ.render(cam, scene)
film.block_until_ready()
dt = time.perf_counter() - t0
mr = integ.last_ray_count / dt / 1e6
a = np.asarray(film)
ok = bool(np.isfinite(a).all() and (a[..., 3] > 0).any())
print(f"[ab] sponza {res[0]}x{res[1]} 1spp d5 [{tag}]: {dt:.2f}s "
      f"-> {mr:.3f} Mrays/s  finite={ok}", flush=True)

try:
    with open(_BANK) as f:
        d = json.load(f)
except Exception:  # noqa: BLE001
    d = {}
d[f"ab_sponza_{res[0]}x{res[1]}[{tag}]"] = round(mr, 3)
d["updated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
with open(_BANK, "w") as f:
    json.dump(d, f, indent=1)
