"""Benchmark entry: prints ONE JSON line for the driver.

Headline: Sponza-class 123.6k-tri GLB at 1920x1080, 4 spp, depth 5 —
BASELINE.json Config E (>= 200 Mrays/s/chip target; ref gallery
README.md:105-107). The cornell criterion workload (640x480, 16 spp,
depth 5 — benches/benchmark_pathtracer.rs:9-33) rides along as an extra
field.

Timeout-proof by construction: the cornell JSON line is printed (and
flushed) the moment it exists, so the driver ALWAYS records a number even
if the process is killed mid-Sponza. The Sponza leg then runs under an
explicit wall-clock budget (signal.alarm); if it completes, a second,
upgraded JSON line replaces the verdict (the driver takes the LAST line).
"""

import json
import os
import signal
import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_TARGET_MRAYS = 200.0  # BASELINE.json: >= 200 Mrays/sec/chip
SPONZA_BUDGET_S = int(os.environ.get("BENCH_SPONZA_BUDGET_S", "1200"))


def _time_render(integ, cam, scene):
    film = integ.render(cam, scene)  # compile + warmup
    film.block_until_ready()
    t0 = time.perf_counter()
    film = integ.render(cam, scene)
    film.block_until_ready()
    dt = time.perf_counter() - t0
    return integ.last_ray_count / dt / 1e6


def bench_cornell():
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator
    cam, scene, _ = load_mitsuba("data/cornell-box.xml",
                                 resolution=(640, 480))
    return _time_render(cam=cam, scene=scene,
                        integ=PathIntegrator(PathConfig(max_depth=5, mis_mode="onesample"),
                                             spp=16))


def bench_sponza():
    from pathtracer_tpu.scene.gltf import load_gltf
    from pathtracer_tpu.integrator import (PathConfig, PathIntegrator,
                                           TracedScene)
    cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(1920, 1080))
    scene = TracedScene.create(sd)
    return _time_render(cam=cam, scene=scene,
                        integ=PathIntegrator(PathConfig(max_depth=5, mis_mode="onesample"),
                                             spp=4))


class _Timeout(Exception):
    pass


def _tuned_marker():
    """Which hardware-tuned launch geometry this run applied, if any
    (tuned.json is written by tools/auto_tune.py from the TPU ledger)."""
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "tuned.json")) as f:
            t = json.load(f)
        knobs = {k: v for k, v in t.items()
                 if not k.startswith("decided")}
        return {"tuned": knobs} if knobs else {}
    except Exception:  # noqa: BLE001
        return {}


_CACHE = os.path.join(os.path.dirname(__file__), ".bench_cache.json")


def main():
    # The axon tunnel can wedge for >1h after an unclean client death
    # (PLAN.md gotchas); if that happens mid-bench the process hangs
    # with nothing printed. Emit the last MEASURED result first, marked
    # stale, so the driver records a number through an outage; every
    # fresh measurement below overrides it (driver takes the LAST line).
    try:
        with open(_CACHE) as f:
            prev = json.load(f)
        prev["stale_from_cache"] = True
        # Age marker (VERDICT r3 weak #8): a replayed line must say WHEN
        # it was measured, so "one round stale" != "three rounds stale".
        prev.setdefault("measured_at", "unknown (pre-round-4 cache)")
        if "measured_at" in prev:
            prev["stale_note"] = f"replayed; measured {prev['measured_at']}"
        print(json.dumps(prev), flush=True)
    except Exception:  # noqa: BLE001 — no cache yet
        pass

    def _alarm(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, _alarm)

    # cornell leg under its own budget: a wedged tunnel (dead relay —
    # attaches hang forever) must still exit with the stale line standing
    signal.alarm(int(os.environ.get("BENCH_CORNELL_BUDGET_S", "900")))
    try:
        cornell = bench_cornell()
        signal.alarm(0)
    except _Timeout:
        print("cornell leg timed out (tunnel wedged?); stale line stands",
              file=sys.stderr, flush=True)
        return
    except Exception:  # noqa: BLE001
        signal.alarm(0)
        traceback.print_exc()
        return
    out = {
        "metric": "cornell_640x480_16spp_d5_mrays_per_sec",
        "unit": "Mrays/s",
        "value": round(cornell, 3),
        "vs_baseline": round(cornell / BASELINE_TARGET_MRAYS, 4),
        "cornell_640x480_16spp_d5_mrays": round(cornell, 3),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sponza_pending": True,
    }
    out.update(_tuned_marker())
    print(json.dumps(out), flush=True)  # recorded even if killed below
    try:
        with open(_CACHE, "w") as f:
            json.dump(out, f)
    except Exception:  # noqa: BLE001
        pass

    signal.alarm(SPONZA_BUDGET_S)
    try:
        sponza = bench_sponza()
        signal.alarm(0)
        out = {
            "metric": "sponza_1080p_4spp_d5_mrays_per_sec",
            "unit": "Mrays/s",
            "value": round(sponza, 3),
            "vs_baseline": round(sponza / BASELINE_TARGET_MRAYS, 4),
            "cornell_640x480_16spp_d5_mrays": round(cornell, 3),
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime()),
        }
        out.update(_tuned_marker())
        print(json.dumps(out), flush=True)
        try:
            with open(_CACHE, "w") as f:
                json.dump(out, f)
        except Exception:  # noqa: BLE001
            pass
    except _Timeout:
        print(f"sponza leg exceeded {SPONZA_BUDGET_S}s budget; "
              "cornell line stands", file=sys.stderr, flush=True)
    except Exception:  # noqa: BLE001 — the cornell line already stands
        signal.alarm(0)
        traceback.print_exc()


if __name__ == "__main__":
    main()
