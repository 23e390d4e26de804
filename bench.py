"""Benchmark: Cornell box 640x480 @ 16 spp, max_depth 5 (the reference's
criterion bench workload, benches/benchmark_pathtracer.rs:9-33) on the
default JAX device. Prints one JSON line with Mrays/s."""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_TARGET_MRAYS = 200.0  # BASELINE.json: >= 200 Mrays/sec/chip


def main():
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator

    cam, scene, _ = load_mitsuba("data/cornell-box.xml", resolution=(640, 480))
    integ = PathIntegrator(PathConfig(max_depth=5), spp=16)

    # warmup/compile
    film = integ.render(cam, scene)
    film.block_until_ready()

    t0 = time.perf_counter()
    film = integ.render(cam, scene)
    film.block_until_ready()
    dt = time.perf_counter() - t0
    rays = integ.last_ray_count
    mrays = rays / dt / 1e6

    print(json.dumps({
        "metric": "cornell_640x480_16spp_d5_mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
