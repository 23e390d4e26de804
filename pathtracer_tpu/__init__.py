"""pathtracer_tpu — a TPU-native (JAX/XLA/Pallas) physically-based path tracer.

A ground-up rebuild of the capabilities of ``oceanusxiv/pathtracer-rs`` (a
PBRT-style CPU path tracer in Rust) designed for TPU hardware: wavefront
integration over SoA ray queues, host-built BVH with device traversal,
vectorized BSDF/light sampling, Sobol low-discrepancy sequences as u32
bit-matrix ops, and data-parallel film accumulation across a
``jax.sharding.Mesh``.

Layer map (mirrors reference src/lib.rs:19-22 layering, rebuilt TPU-first):
  core/      — math, spectrum, camera, film, filters      (ref: src/common/)
  ops/       — device compute: intersect, bsdf, lights, sobol (ref: src/pathtracer/)
  accel/     — host BVH build + flattened node arrays     (ref: accelerator.rs)
  scene/     — Mitsuba XML / GLTF importers → device arrays (ref: src/*/importer/)
  integrator — wavefront path integrator                  (ref: integrator.rs)
  parallel/  — pjit/shard_map multi-chip render           (ref: rayon tiles)
  frontend/  — CLI, headless runner, tev protocol         (ref: main.rs, headless.rs)
"""

__version__ = "0.1.0"
