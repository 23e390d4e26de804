"""Traversal step census on the CPU backend — the hardware-independent
perf signal for BVH tuning.

The measured TPU cost model (PLAN "Measured TPU facts") is
  wall-time ≈ while_loop trips × lanes × ~7 ns/row-gather
so for a chunked wave the predicted cost is
  Σ_chunks max(steps over chunk lanes) × chunk_width × 7 ns.
Per-lane step counts are exact on any backend (count_steps=True), which
makes tree-quality and chunk/sort experiments measurable without the TPU.

Usage: python tools/step_census.py [sponza|cornell ...]  (default both)
"""

import os
import sys

# CPU-only: this container's sitecustomize registers the axon TPU backend
# unless the pool var is gone BEFORE jax import (see __graft_entry__)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathtracer_tpu.integrator import TracedScene  # noqa: E402
from pathtracer_tpu.accel.bvhw import bvhw_intersect  # noqa: E402
from pathtracer_tpu.core.camera import generate_rays  # noqa: E402

N = 16384
NS_PER_ROW = 7.0e-9  # measured fast-regime gather cost per row per lane


def ray_sets(cam, sd, scene, rng):
    """cam / bush / diffuse-bounce ray sets, (name, o, d, t_max)."""
    res = np.asarray(cam.resolution, np.float32)
    px = rng.random((N, 2)).astype(np.float32) * res
    r2c, rot, pos = cam.ray_params()
    o_cam, d_cam = generate_rays(r2c, rot, pos, jnp.asarray(px))
    t_inf = jnp.full((N,), np.inf, jnp.float32)

    lo = np.asarray(sd.p0).min(0)
    hi = np.asarray(sd.p0).max(0)
    center = 0.5 * (lo + hi)
    o_b = np.tile(center[None, :].astype(np.float32), (N, 1))
    o_b += 0.05 * (hi - lo) * rng.standard_normal((N, 3)).astype(np.float32)
    dn = rng.standard_normal((N, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=-1, keepdims=True)

    # diffuse bounce rays: cosine hemisphere around the camera hits'
    # geometric normals (the wave the sort key actually serves)
    hit = bvhw_intersect(scene.bw_rows, o_cam, d_cam, t_inf)
    hv = np.asarray(hit["valid"])
    t = np.asarray(hit["t"])
    p = np.asarray(o_cam) + t[:, None] * np.asarray(d_cam)
    tri = np.asarray(hit["tri"])
    e1 = np.asarray(sd.p1)[tri] - np.asarray(sd.p0)[tri]
    e2 = np.asarray(sd.p2)[tri] - np.asarray(sd.p0)[tri]
    ng = np.cross(e1, e2)
    nl = np.linalg.norm(ng, axis=-1, keepdims=True)
    ng = ng / np.maximum(nl, 1e-20)
    u = rng.random((N, 2)).astype(np.float32)
    r = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    loc = np.stack([r * np.cos(phi), r * np.sin(phi),
                    np.sqrt(np.maximum(0, 1 - u[:, 0]))], -1)
    a = np.where(np.abs(ng[:, 0:1]) > 0.9, np.array([[0.0, 1, 0]]),
                 np.array([[1.0, 0, 0]]))
    tx = np.cross(a, ng)
    tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-20)
    ty = np.cross(ng, tx)
    d_dif = (loc[:, 0:1] * tx + loc[:, 1:2] * ty + loc[:, 2:3] * ng)
    d_dif = d_dif.astype(np.float32)
    o_dif = (p + 1e-4 * ng).astype(np.float32)
    t_dif = jnp.asarray(np.where(hv, np.inf, 0.0).astype(np.float32))

    return [("cam    ", o_cam, d_cam, t_inf),
            ("bush   ", jnp.asarray(o_b), jnp.asarray(dn), t_inf),
            ("bounce1", jnp.asarray(o_dif), jnp.asarray(d_dif), t_dif)]


def census(table, rays, label=""):
    for name, o, d, t in rays:
        hit = bvhw_intersect(table, o, d, t, count_steps=True)
        s = np.asarray(hit["steps"])
        live = np.asarray(t) > 0
        sl = s[live]
        line = (f"{label}{name} steps mean={sl.mean():7.1f} "
                f"p50={np.percentile(sl, 50):6.0f} "
                f"p90={np.percentile(sl, 90):6.0f} "
                f"p99={np.percentile(sl, 99):6.0f} max={sl.max():5d} "
                f"dead={(~live).mean() * 100:4.1f}%")
        # predicted chunked cost at the wave size, μs per 16k wave
        for chunks, srt in ((1, False), (4, False), (4, True), (8, True)):
            key = np.argsort(s) if srt else np.arange(N)
            sc = s[key].reshape(chunks, -1)
            cost = (sc.max(axis=1) * (N // chunks)).sum() * NS_PER_ROW
            line += f" | c{chunks}{'s' if srt else ' '}={cost * 1e6:6.0f}us"
        print(line, flush=True)


def main():
    which = set(sys.argv[1:]) or {"sponza", "cornell"}
    rng = np.random.default_rng(7)
    if "cornell" in which:
        from pathtracer_tpu.scene.mitsuba import load_mitsuba
        cam, sd, _ = load_mitsuba("data/cornell-box.xml",
                                  resolution=(640, 480))
        scene = TracedScene.create(sd)
        if scene.bw_rows is None:
            print("[cornell] no BVH32 table (tiny scene uses the dense "
                  "intersect) — nothing to census")
        else:
            print(f"[cornell] rows={scene.bw_rows.shape[0]}")
            census(scene.bw_rows, ray_sets(cam, sd, scene, rng),
                   "[cornell] ")
    if "sponza" in which:
        from pathtracer_tpu.scene.gltf import load_gltf
        cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
        scene = TracedScene.create(sd)
        print(f"[sponza] rows={scene.bw_rows.shape[0]} "
              f"alpha_rows={scene.bwa_rows.shape[0]}")
        census(scene.bw_rows, ray_sets(cam, sd, scene, rng), "[sponza] ")


if __name__ == "__main__":
    main()
