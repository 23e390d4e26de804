"""Micro-bench pins: AABB slab test + sampler dimension draw.

The reference's criterion suite times two micro-ops besides the full
render (benches/benchmark_pathtracer.rs:35-71): bench_bounds (one
``Bounds3::intersect_p_precomp`` slab test) and bench_samplers
(``StratifiedSampler::start_pixel``, 32x32 spp, 8 dims). These are the
TPU wave analogues — the same math amortized over a 131k-lane wave, so
the number that matters (and that regressions move) is ns/lane.

Run on whatever backend is live (TPU via axon, else CPU); results are
appended to MICROBENCH.json with the backend recorded, so pins are only
comparable backend-to-same-backend. Record the numbers in PLAN.md.

Usage: python tools/microbench.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, "/root/repo")

from pathtracer_tpu.accel.bvh import _slab_test  # noqa: E402
from pathtracer_tpu.ops.samplers import (hash_u32,  # noqa: E402
                                         stratified_sample_dim,
                                         stratified_sample_dim2)

N = 131072
REPS = 20


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS, out


def main():
    backend = jax.devices()[0].platform
    results = {"backend": backend, "n_lanes": N,
               "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())}

    # --- bench_bounds analogue: N independent slab tests ---------------
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    inv_d = jnp.asarray(1.0 / d)
    bmin = jnp.asarray(rng.uniform(-1, 0, (N, 3)), jnp.float32)
    bmax = bmin + jnp.asarray(rng.uniform(0.1, 1, (N, 3)), jnp.float32)
    t_best = jnp.full((N,), jnp.inf, jnp.float32)

    slab = jax.jit(_slab_test)
    dt, hits = timed(slab, bmin, bmax, o, inv_d, t_best)
    ns = dt / N * 1e9
    results["slab_test_ns_per_lane"] = round(ns, 4)
    print(f"[bounds] slab test: {ns:.3f} ns/lane "
          f"({dt * 1e6:.1f} us/wave, {float(jnp.mean(hits)):.2f} hit rate)",
          flush=True)

    # --- bench_samplers analogue: start_pixel, 32x32=1024 spp, 8 dims --
    # the ref draws all spp x dims samples of ONE pixel up front
    # (stratified.rs start_pixel); the wave analogue draws one (dim,
    # frame) slice for N pixels — total samples timed is identical math.
    spp_log2 = 10  # 1024 = 32^2
    ph = hash_u32(jnp.arange(N, dtype=jnp.uint32))

    @jax.jit
    def start_pixel(ph):
        acc = jnp.zeros((N,), jnp.float32)
        for dim in range(8):
            acc = acc + stratified_sample_dim(ph, 3, spp_log2, dim)
        acc = acc + stratified_sample_dim2(ph, 3, spp_log2, 8).sum(-1)
        return acc

    dt, _ = timed(start_pixel, ph)
    ns = dt / N / 10 * 1e9  # 8 1D dims + one 2D pair = 10 values
    results["stratified_dim_ns_per_value_per_lane"] = round(ns, 4)
    print(f"[sampler] stratified draw: {ns:.3f} ns/value/lane "
          f"({dt * 1e6:.1f} us for 10 dims x {N} lanes)", flush=True)

    try:
        with open("/root/repo/MICROBENCH.json") as f:
            hist = json.load(f)
    except Exception:  # noqa: BLE001
        hist = []
    hist.append(results)
    with open("/root/repo/MICROBENCH.json", "w") as f:
        json.dump(hist, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
