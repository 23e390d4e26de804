"""Probe 3: table-BYTES threshold for the fast-gather regime + k-pipelining
at BVH32 geometry (W=256). Refines probe_gather_width2's finding that
R=16384/W=128 (8 MB) gathers at 5.5 ns/row vs 12.2 at 16 MB.

Usage: python tools/probe_gather_width3.py [n_lanes]
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
STEPS = 64

rng = np.random.default_rng(0)


def probe(r, w, k=1):
    table = jnp.asarray(rng.random((r, w)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, r, (k, N)).astype(np.int32))

    @jax.jit
    def chain(idx):
        def body(i, carry):
            idx, acc = carry
            outs = []
            for j in range(k):
                row = table[idx[j]]
                acc = acc + row[:, 0]
                outs.append((idx[j] * 1664525 + 1013904223 +
                             row[:, w - 1].astype(jnp.int32)) % r)
            return jnp.stack(outs), acc
        return jax.lax.fori_loop(0, STEPS, body, (idx, jnp.zeros(N)))

    out = jax.block_until_ready(chain(idx0))
    t0 = time.perf_counter()
    for _ in range(3):
        out = chain(idx0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    per_row = dt / (STEPS * N * k) * 1e9
    mb = r * w * 4 / (1 << 20)
    print(f"R={r:7d} W={w:3d} k={k} {mb:7.1f}MB: {dt*1e3:7.1f} ms  "
          f"{per_row:7.2f} ns/row/lane", flush=True)


print(f"lanes={N} steps={STEPS}", flush=True)
print("-- bytes sweep at W=256 (BVH32 rows)", flush=True)
for r in (1024, 2048, 4096, 8192, 12288, 16384, 24576, 32768):
    probe(r, 256)
print("-- k at W=256, R=8192 (8 MB, Sponza-like)", flush=True)
for k in (1, 2, 3, 4):
    probe(8192, 256, k=k)
print("-- bytes sweep at W=64 (is it bytes or rows?)", flush=True)
for r in (16384, 32768, 65536, 131072):
    probe(r, 64)
