"""Probe 2: row-gather cost at BVH16/BVH32 widths + multi-gather loops.

Decides whether to widen the tree (128/256-float rows: fewer levels,
same per-row cost?) and whether k INDEPENDENT gathers inside one loop
body pipeline (traverse 2 subtrees per lane per iteration).

Usage: python tools/probe_gather_width2.py [n_lanes]
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


def probe(r, w, k=1, label=""):
    table = jnp.asarray(rng.random((r, w)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, r, (k, N)).astype(np.int32))

    @jax.jit
    def chain(idx):
        def body(i, carry):
            idx, acc = carry
            outs = []
            for j in range(k):  # k INDEPENDENT dependency chains
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
    print(f"R={r:7d} W={w:3d} k={k}{label:10s}: {dt*1e3:7.1f} ms  "
          f"{per_row:7.2f} ns/row/lane", flush=True)


print(f"lanes={N} steps={STEPS}", flush=True)
print("-- width sweep (R=32768)", flush=True)
for w in (64, 96, 128, 160, 192, 256):
    probe(32768, w)
print("-- independent-gather count (R=32768, W=64)", flush=True)
for k in (1, 2, 3, 4):
    probe(32768, 64, k=k)
print("-- width x k (R=16384, W=128)", flush=True)
for k in (1, 2):
    probe(16384, 128, k=k)
