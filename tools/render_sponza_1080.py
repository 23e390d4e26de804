"""Config E gallery render: Sponza GLB at 1920x1080 (BASELINE.json;
ref flagship README.md:105-107). Checkpointed so an interrupted run
resumes; writes gallery/sponza_1080p_<spp>spp.png.

Usage: python tools/render_sponza_1080.py [spp] [depth] [checkpoint]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtracer_tpu.core.film import to_rgb8  # noqa: E402
from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,  # noqa
                                       TracedScene)
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402
from pathtracer_tpu.utils.image import write_png  # noqa: E402

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
depth = int(sys.argv[2]) if len(sys.argv) > 2 else 5
ck = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sponza_1080.ck.npz"
# smoke-test knobs (CPU dry runs of the full script glue at tiny res)
res = (int(os.environ.get("GALLERY_W", 1920)),
       int(os.environ.get("GALLERY_H", 1080)))

t0 = time.time()
cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=res)
scene = TracedScene.create(sd)
print(f"scene {time.time()-t0:.1f}s rows={scene.bw_rows.shape[0]}",
      flush=True)

integ = PathIntegrator(PathConfig(max_depth=depth, mis_mode="onesample"),
                       spp=spp)
t0 = time.time()

out = (f"gallery/sponza_1080p_{integ.spp}spp.png" if res == (1920, 1080)
       else f"/tmp/sponza_{res[0]}x{res[1]}_{integ.spp}spp.png")

# Wall-clock budget: a TPU render process must NEVER be killed mid-op
# (the axon terminal stays claimed >40 min after an unclean client
# death, PLAN.md gotchas) — so instead of an outer timeout, stop
# CLEANLY at the next chunk boundary once the budget is spent. The
# checkpoint makes a later run resume where this one stopped.
budget_s = float(os.environ.get("GALLERY_BUDGET_S", "0") or 0)
done_spp = [0]


class _Budget(Exception):
    pass


def progress(film, done):
    # Write the partial image every chunk: the additive (rgb*w, sum_w)
    # accumulator normalizes correctly at any sample count, so an
    # interrupted run still leaves a valid (noisier) gallery artifact.
    # Write-temp + os.replace so an interrupt mid-write can't leave a
    # truncated PNG at the artifact path (ADVICE r4).
    write_png(out + ".tmp", to_rgb8(film))
    os.replace(out + ".tmp", out)
    done_spp[0] = done
    print(f"  {done}/{integ.spp} spp  {time.time()-t0:.0f}s  -> {out}",
          flush=True)
    if budget_s and time.time() - t0 > budget_s and done < integ.spp:
        raise _Budget


try:
    film = integ.render_progressive(cam, scene, chunk_spp=4,
                                    callback=progress, checkpoint=ck)
except _Budget:
    # rename the partial artifact to its TRUE sample count so the
    # filename never over-claims quality
    truth = (out.replace(f"{integ.spp}spp", f"{done_spp[0]}spp")
             if done_spp[0] else None)
    if truth and truth != out:
        os.replace(out, truth)
        print(f"budget {budget_s:.0f}s spent at {done_spp[0]} spp "
              f"-> {truth} (resume: rerun with the same checkpoint)",
              flush=True)
    sys.exit(0)
dt = time.time() - t0
rays = integ.last_ray_count
print(f"render {dt:.1f}s rays={rays/1e6:.1f}M -> {rays/dt/1e6:.2f} Mrays/s",
      flush=True)
write_png(out, to_rgb8(film))
print("wrote", out, flush=True)
