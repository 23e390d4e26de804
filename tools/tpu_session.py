"""One-attach TPU measurement session: runs every open measurement in a
single process (each fresh attach costs 90s-6min, so batch them all).

Covers, in order (headlines first, so a mid-session tunnel death still
banks the numbers that matter; tuning ledgers after):
  1. cornell bench (640x480, 16 spp, d5) — the round-1 criterion
  2. Sponza e2e 480x270 and 1920x1080 @1spp d5 (the Config E headline)
  3. eband: segmented rays-per-launch sweep at 1080p (seg_wave_lanes)
  4. cornell band-size sweep + cornell wave ledger (d0/d1/d3 deltas on
     the dense-intersect path — where the 80 Mrays/s bar lives)
  5. BVH32 traversal ledger on Sponza: plain vs interleave-2 vs chunks,
     closest + anyhit, bush (incoherent) + camera rays
  6. shading ledger deltas (wave d0/d1 with/without NEE) + sort A/B
  7. segmented-envelope probe: 131k-ray wave at depth 15 (the old cap's
     impossible case) — crash-matrix replacement

Usage: python tools/tpu_session.py [stage...]   (default: all)
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

stages = set(sys.argv[1:]) or {"cornell", "e2e", "eband", "cband",
                               "cshade", "trav", "shade", "seg", "tune"}

# Incremental result banking: every stage appends its numbers the moment
# they exist, so a mid-session tunnel death still keeps partial results
# (VERDICT r3 item 1).
import json  # noqa: E402

_BANK = "/root/repo/TPU_SESSION.json"
_CACHE = "/root/repo/.bench_cache.json"

# CPU smoke runs (JAX_PLATFORMS=cpu) must never masquerade as hardware
# measurements: bank them to a separate file and never touch the bench
# cache. (A CPU run once overwrote TPU_SESSION.json with 0.28 Mrays/s
# "cornell" lines — meaningless as TPU evidence.) Detected from the env,
# NOT jax.default_backend(): probing backends at import can hang ~25 min
# against a dead axon tunnel.
_ON_CPU = "cpu" in os.environ.get("JAX_PLATFORMS", "").lower()
if _ON_CPU:
    _BANK = "/root/repo/TPU_SESSION_cpu_smoke.json"


def bank(key, value):
    try:
        with open(_BANK) as f:
            d = json.load(f)
    except Exception:  # noqa: BLE001
        d = {}
    d[key] = value
    d["updated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(_BANK, "w") as f:
        json.dump(d, f, indent=1)


def refresh_cache(line):
    """Overwrite .bench_cache.json so even a later total outage replays a
    FRESH measurement instead of a rounds-old one."""
    if _ON_CPU:
        return  # smoke run: never seed the driver's stale-line cache
    line["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(_CACHE, "w") as f:
        json.dump(line, f)


t_attach = time.time()
jax.device_put(np.zeros(8, np.float32)).block_until_ready()
print(f"[attach] {time.time()-t_attach:.1f}s", flush=True)
bank("attach_s", round(time.time() - t_attach, 1))
bank("platform", jax.default_backend())


def timed(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:8.1f} ms", flush=True)
    bank(name.strip(), round(ms, 2))


from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,  # noqa
                                       TracedScene, _scene_intersect,
                                       _scene_intersect_p, trace_wave)

# ---------------------------------------------------------------- cornell
if stages & {"cornell", "cband", "cshade"}:
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    cam_c, sd_c, _ = load_mitsuba("data/cornell-box.xml",
                                  resolution=(640, 480))
if "cornell" in stages:
    integ = PathIntegrator(PathConfig(max_depth=5, mis_mode="onesample"),
                           spp=16)
    t0 = time.time()
    film = integ.render(cam_c, sd_c)
    film.block_until_ready()
    print(f"[cornell] warmup {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    film = integ.render(cam_c, sd_c)
    film.block_until_ready()
    dt = time.perf_counter() - t0
    mrays = integ.last_ray_count / dt / 1e6
    print(f"[cornell] {mrays:.1f} Mrays/s ({dt:.2f}s)", flush=True)
    bank("cornell_640x480_16spp_d5_mrays", round(mrays, 2))
    refresh_cache({
        "metric": "cornell_640x480_16spp_d5_mrays_per_sec",
        "unit": "Mrays/s", "value": round(mrays, 3),
        "vs_baseline": round(mrays / 200.0, 4),
        "cornell_640x480_16spp_d5_mrays": round(mrays, 3),
    })

if stages & {"trav", "shade", "seg", "e2e", "eband"}:
    from pathtracer_tpu.scene.gltf import load_gltf
    t0 = time.time()
    cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
    scene = TracedScene.create(sd)
    print(f"[sponza] scene {time.time()-t0:.1f}s "
          f"rows={scene.bw_rows.shape[0]} "
          f"alpha_rows={scene.bwa_rows.shape[0]}", flush=True)
    bank("sponza_scene_build_s", round(time.time() - t0, 1))

    N = 65536
    rng = np.random.default_rng(0)
    center = np.asarray(0.5 * (np.asarray(sd.p0).min(0)
                               + np.asarray(sd.p0).max(0)))
    o_bush = jnp.asarray(np.tile(center[None, :] + np.array([0, 1, 0],
                                                            np.float32),
                                 (N, 1)).astype(np.float32))
    dn = rng.normal(size=(N, 3)).astype(np.float32)
    dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
    d_bush = jnp.asarray(dn)
    from pathtracer_tpu.core.camera import generate_rays
    px = rng.random((N, 2)).astype(np.float32) * np.asarray([640, 480],
                                                            np.float32)
    r2c, rot, pos = cam.ray_params()
    o_cam, d_cam = generate_rays(r2c, rot, pos, jnp.asarray(px))
    t_inf = jnp.full((N,), np.inf, jnp.float32)
    t_100 = jnp.full((N,), 100.0, jnp.float32)

# ------------------------------------------------------------------- e2e
if "e2e" in stages:
    for res in ((480, 270), (1920, 1080)):
        cam_r, _, _ = load_gltf("data/sponza_proc.glb", resolution=res)
        integ_r = PathIntegrator(PathConfig(max_depth=5,
                                            mis_mode="onesample"), spp=1)
        t0 = time.time()
        film_r = integ_r.render(cam_r, scene)
        film_r.block_until_ready()
        print(f"[e2e] {res[0]}x{res[1]} warmup(compile) "
              f"{time.time()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        film_r = integ_r.render(cam_r, scene)
        film_r.block_until_ready()
        dt = time.perf_counter() - t0
        rays = integ_r.last_ray_count
        mrays = rays / dt / 1e6
        print(f"[e2e] sponza {res[0]}x{res[1]} spp1 d5: {dt:.2f}s "
              f"rays={rays/1e6:.1f}M -> {mrays:.2f} Mrays/s",
              flush=True)
        bank(f"sponza_{res[0]}x{res[1]}_1spp_d5_mrays", round(mrays, 3))
    from pathtracer_tpu.core.film import to_rgb8
    from pathtracer_tpu.utils.image import write_png
    write_png("/tmp/sponza_e2e.png", to_rgb8(film_r))
    print("wrote /tmp/sponza_e2e.png", flush=True)

# ----------------------------------------------------------------- eband
if "eband" in stages:
    # segmented rays-per-launch sweep at the Config E resolution: the
    # per-bounce programs have no fault envelope, so launch size is a
    # free knob (auto_tune reads sponza_wave{N}_mrays -> seg_wave_lanes)
    from tools.auto_tune import _WAVE_SWEEP
    res_eb = (1920, 1080)
    cam_eb, _, _ = load_gltf("data/sponza_proc.glb", resolution=res_eb)
    for wl in _WAVE_SWEEP:
        os.environ["PTPU_SEG_WAVE_LANES"] = str(wl)
        integ_eb = PathIntegrator(PathConfig(max_depth=5,
                                             mis_mode="onesample"), spp=1)
        film_eb = integ_eb.render(cam_eb, scene)
        film_eb.block_until_ready()
        t0 = time.perf_counter()
        film_eb = integ_eb.render(cam_eb, scene)
        film_eb.block_until_ready()
        dt = time.perf_counter() - t0
        mr = integ_eb.last_ray_count / dt / 1e6
        print(f"[eband] wave_lanes={wl}: {mr:6.2f} Mrays/s", flush=True)
        bank(f"sponza_wave{wl}_mrays", round(mr, 3))
    del os.environ["PTPU_SEG_WAVE_LANES"]

# ------------------------------------------------------------------ cband
if "cband" in stages:
    # cornell wave-size sweep: default band is wave_cap//ws = 203 rows
    # (131k-ray waves); smaller bands trade launch overhead for less
    # padding waste and more pipeline overlap across launches.
    spp_b = int(os.environ.get("TPU_SESSION_SPP", 16))  # CPU smoke knob
    from tools.auto_tune import _BAND_SWEEP
    for br in _BAND_SWEEP:
        integ_b = PathIntegrator(PathConfig(max_depth=5,
                                            mis_mode="onesample"),
                                 spp=spp_b, band_rows=br)
        film_b = integ_b.render(cam_c, sd_c)
        film_b.block_until_ready()
        t0 = time.perf_counter()
        film_b = integ_b.render(cam_c, sd_c)
        film_b.block_until_ready()
        dt = time.perf_counter() - t0
        mr = integ_b.last_ray_count / dt / 1e6
        print(f"[cband] band_rows={br:3d}: {mr:6.1f} Mrays/s", flush=True)
        bank(f"cornell_band{br}_mrays", round(mr, 2))

# ----------------------------------------------------------------- cshade
if "cshade" in stages:
    # where does the cornell wave's time go? d0 = rays+intersect+Le;
    # d1-d0 = one bounce of NEE+BSDF+RR; no-NEE isolates the shadow test.
    import dataclasses as _dc
    sc_c = TracedScene.create(sd_c)
    Nc = int(os.environ.get("TPU_SESSION_NC", 131072))  # CPU smoke knob
    rng_c = np.random.default_rng(1)
    o_c = jnp.asarray(np.tile(np.array([[0.0, 1.0, 2.0]], np.float32),
                              (Nc, 1)))
    dn_c = rng_c.normal(size=(Nc, 3)).astype(np.float32)
    dn_c /= np.linalg.norm(dn_c, axis=-1, keepdims=True)
    d_c = jnp.asarray(dn_c)
    u1_c = jnp.asarray(rng_c.random(Nc).astype(np.float32))
    u2_c = jnp.asarray(rng_c.random((Nc, 2)).astype(np.float32))

    def wave_c(cfg, sc):
        return jax.jit(lambda o, d: trace_wave(
            sc, cfg, lambda dim: u1_c, lambda dim: u2_c, o, d)[0])

    timed("[cshade] intersect 131k    ",
          jax.jit(lambda o, d: _scene_intersect(
              sc_c, o, d, jnp.full((Nc,), jnp.inf, jnp.float32))["t"]),
          o_c, d_c)
    timed("[cshade] wave d0           ",
          wave_c(PathConfig(max_depth=0), sc_c), o_c, d_c)
    timed("[cshade] wave d1 onesample ",
          wave_c(PathConfig(max_depth=1, mis_mode="onesample"), sc_c),
          o_c, d_c)
    timed("[cshade] wave d1 no-NEE    ",
          wave_c(PathConfig(max_depth=1),
                 _dc.replace(sc_c, n_lights=0)), o_c, d_c)
    timed("[cshade] wave d3 onesample ",
          wave_c(PathConfig(max_depth=3, mis_mode="onesample"), sc_c),
          o_c, d_c)
    timed("[cshade] wave d5 onesample ",
          wave_c(PathConfig(max_depth=5, mis_mode="onesample"), sc_c),
          o_c, d_c)


# ------------------------------------------------------------------ trav
if "trav" in stages:
    from pathtracer_tpu.accel.bvhw import (bvhw_intersect,
                                           bvhw_intersect_chunked)
    tab = scene.bw_rows
    for rays_name, o_, d_ in (("bush", o_bush, d_bush),
                              ("cam ", o_cam, d_cam)):
        timed(f"[trav] {rays_name} plain   closest",
              jax.jit(lambda o, d: bvhw_intersect(tab, o, d, t_inf)),
              o_, d_)
        # the auto-tune candidate set, measured through the SAME entry
        # point the integrator dispatches (bvhw_intersect_chunked);
        # single source of truth with tools/auto_tune.decide
        from tools.auto_tune import _TRAV_CANDIDATES
        for (ch, il), sfx in sorted(_TRAV_CANDIDATES.items()):
            timed(f"[trav] {rays_name} {sfx}",
                  jax.jit(lambda o, d, ch=ch, il=il: bvhw_intersect_chunked(
                      tab, o, d, t_inf, chunks=ch, interleave=il)),
                  o_, d_)
        timed(f"[trav] {rays_name} plain   anyhit ",
              jax.jit(lambda o, d: bvhw_intersect(tab, o, d, t_100,
                                                  any_hit=True)), o_, d_)
        timed(f"[trav] {rays_name} full closest(split)",
              jax.jit(lambda o, d: _scene_intersect(scene, o, d, t_inf)),
              o_, d_)
        timed(f"[trav] {rays_name} full anyhit (split)",
              jax.jit(lambda o, d: _scene_intersect_p(scene, o, d, t_100)),
              o_, d_)

# ----------------------------------------------------------------- shade
if "shade" in stages:
    import dataclasses
    u1 = jnp.asarray(rng.random(N).astype(np.float32))
    u2 = jnp.asarray(rng.random((N, 2)).astype(np.float32))

    def wave(cfg, sc):
        return jax.jit(lambda o, d: trace_wave(
            sc, cfg, lambda dim: u1, lambda dim: u2, o, d)[0])

    key = jnp.asarray(rng.integers(0, 1 << 20, N).astype(np.int32))
    timed("[shade] argsort 65k i32    ",
          jax.jit(lambda k: jnp.argsort(k)), key)
    from pathtracer_tpu.ops.sort import bucket_argsort, radix_argsort
    timed("[shade] radix10 65k i32    ",
          jax.jit(lambda k: radix_argsort(k)), key)
    timed("[shade] bucket16 65k i32   ",
          jax.jit(lambda k: bucket_argsort(k)), key)
    from pathtracer_tpu.ops import bsdf as bx
    timed("[shade] gather_params      ",
          jax.jit(lambda uv: bx.gather_params(
              scene.data, jnp.zeros(N, jnp.int32), uv,
              mat_attr=scene.mat_attr, has_tex=scene.has_tex,
              tex_channels=scene.tex_channels)["kd"].sum()), u2)
    timed("[shade] wave d0            ",
          wave(PathConfig(max_depth=0), scene), o_bush, d_bush)
    timed("[shade] wave d1 onesample  ",
          wave(PathConfig(max_depth=1, mis_mode="onesample"), scene),
          o_bush, d_bush)
    timed("[shade] wave d1 no-NEE     ",
          wave(PathConfig(max_depth=1),
               dataclasses.replace(scene, n_lights=0)), o_bush, d_bush)
    timed("[shade] wave d3 onesample  ",
          wave(PathConfig(max_depth=3, mis_mode="onesample"), scene),
          o_bush, d_bush)

# ------------------------------------------------------------------- seg
if "seg" in stages:
    # the old cap's impossible case: depth 15 segmented. TINY-res proof
    # leg (VERDICT r4 item 9: the 640x200 form of this burned 67 min of
    # hardware time in r4 while the headline starved) — the fault
    # envelope is (depth segments x wave lanes) SHAPE coverage, so one
    # 320x64 band at depth 15 proves the same program structure.
    cam15, sd15, _ = load_gltf("data/sponza_proc.glb",
                               resolution=(320, 64))  # ~20k rays/band
    integ15 = PathIntegrator(PathConfig(max_depth=15,
                                        mis_mode="onesample"), spp=1)
    t0 = time.time()
    film15 = integ15.render(cam15, scene)
    film15.block_until_ready()
    a = np.asarray(film15)
    assert np.isfinite(a).all() and (a[..., 3] > 0).any()
    print(f"[seg] depth15 320x64 1spp OK {time.time()-t0:.1f}s "
          f"(incl compile)", flush=True)
    bank("seg_depth15_320x64_ok_s", round(time.time() - t0, 1))

# ------------------------------------------------------------------ tune
if "tune" in stages and not _ON_CPU:
    # last stage: fold the ledger into tuned.json so the pipeline's
    # bench.py (and every later render) runs the winning launch geometry
    from tools.auto_tune import main as auto_tune_main
    auto_tune_main()

