"""Probe: XLA row-gather cost vs row width, table size, and dtype.

Drives the BVH-node layout decision: if cost is per ELEMENT per lane,
packing (bf16 pairs / u8 quads bitcast into f32 lanes) halves/quarters
traversal cost; if cost is per ROW (access granule), wide BVH8 rows are
free and the win is fewer iterations.

Usage: python tools/probe_gather_width.py [n_lanes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
STEPS = 64  # chained gathers (simulates traversal dependency)

rng = np.random.default_rng(0)


def probe(r, w, dtype=jnp.float32, label=""):
    table = jnp.asarray(rng.random((r, w)).astype(np.float32))
    if dtype != jnp.float32:
        table = table.astype(dtype)
    idx0 = jnp.asarray(rng.integers(0, r, N).astype(np.int32))

    @jax.jit
    def chain(idx):
        def body(i, carry):
            idx, acc = carry
            row = table[idx]  # (N, w) gather
            acc = acc + row[:, 0].astype(jnp.float32)
            # derive next index from the row (dependency chain, like
            # traversal following child refs)
            idx = (idx * 1664525 + 1013904223 +
                   row[:, w - 1].astype(jnp.int32)) % r
            return idx, acc
        return jax.lax.fori_loop(0, STEPS, body, (idx, jnp.zeros(N)))

    out = jax.block_until_ready(chain(idx0))
    t0 = time.perf_counter()
    for _ in range(3):
        out = chain(idx0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    per_el = dt / (STEPS * N * w) * 1e9
    per_row = dt / (STEPS * N) * 1e9
    print(f"R={r:7d} W={w:3d} {label:8s}: {dt*1e3:7.1f} ms  "
          f"{per_el:6.3f} ns/el/lane  {per_row:7.2f} ns/row/lane",
          flush=True)


print(f"lanes={N} steps={STEPS}", flush=True)
for w in (4, 8, 12, 16, 20, 24, 32, 44, 64):
    probe(131072, w)
print("-- table size sweep (W=20)", flush=True)
for r in (1024, 8192, 32768, 131072, 524288):
    probe(r, 20)
print("-- dtype (W=20)", flush=True)
probe(131072, 20, jnp.bfloat16, "bf16")
probe(131072, 20, jnp.int8, "int8")
