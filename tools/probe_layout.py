"""Probe: cost of NARROW (N, 3) arrays on the TPU backend.

Hypothesis: XLA TPU tiles rank-2 f32 arrays (8, 128) on the minor two
dims, so a (N, 3) array MATERIALIZES as (N, 128) — a 42x HBM
inflation. The segmented renderer's wave state is ~10 (N, 3) arrays
crossing a jit-program boundary per bounce (integrator._seg_bounce);
if the hypothesis holds, state I/O alone costs ~100s of ms per bounce
at 131k lanes and could dominate the measured Sponza e2e gap
(TPU_SESSION.json sponza_480x270_1spp_d5_mrays = 0.088 vs the ~2
Mrays/s the traversal model predicts).

Measures (banked incrementally to PROBE_LAYOUT.json):
  1. elementwise y = x*a+b on (N,3) / (3,N) / (N,) / (N,128): the
     (N,128) row calibrates what a 42x-padded (N,3) would cost.
  2. jit-boundary state round-trip: one jit pass over a pytree of
     10 arrays, shaped (N,3) vs (3,N) vs 30 flat (N,) — the segmented
     renderer's per-bounce boundary in miniature.
  3. fori_loop x32 carrying one (N,3) vs three (N,) — while_loop carry
     materialization cost (the traversal's barycentric carry).

Run standalone (ONE TPU process at a time): python tools/probe_layout.py
"""

import json
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

_BANK = "/root/repo/PROBE_LAYOUT.json"
if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    _BANK = "/root/repo/PROBE_LAYOUT_cpu_smoke.json"


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


N = 131072

t0 = time.time()
jax.device_put(np.zeros(8, np.float32)).block_until_ready()
print(f"[attach] {time.time()-t0:.1f}s", flush=True)
bank("platform", jax.default_backend())


def timed(name, fn, *args, reps=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:8.3f} ms", flush=True)
    bank(name.strip(), round(ms, 4))
    return ms


rng = np.random.default_rng(0)

# ---- 1. elementwise on narrow vs wide vs flat
x_n3 = jnp.asarray(rng.random((N, 3), np.float32))
x_3n = jnp.asarray(rng.random((3, N), np.float32))
x_f = jnp.asarray(rng.random((3 * N,), np.float32))
x_128 = jnp.asarray(rng.random((N, 128), np.float32))
ew = jax.jit(lambda x: x * 1.0001 + 0.5)
timed("ew_n3   (131k,3)  ", ew, x_n3)
timed("ew_3n   (3,131k)  ", ew, x_3n)
timed("ew_flat (393k,)   ", ew, x_f)
timed("ew_wide (131k,128)", ew, x_128)

# ---- 2. jit-boundary state round-trip (10-array pytree, like _seg_bounce)
st_n3 = [jnp.asarray(rng.random((N, 3), np.float32)) for _ in range(10)]
st_3n = [jnp.asarray(rng.random((3, N), np.float32)) for _ in range(10)]
st_fl = [jnp.asarray(rng.random((N,), np.float32)) for _ in range(30)]
step = jax.jit(lambda st: [a * 1.0001 + 0.01 for a in st])
timed("state10_n3 boundary", step, st_n3)
timed("state10_3n boundary", step, st_3n)
timed("state30_flat bound.", step, st_fl)

# ---- 2b. flat-packed boundary, (N,3) compute inside: the cheap fix —
# params cross the boundary as (3N,) compact, first op reshapes to (N,3)
# for the body, last op flattens back. If XLA fuses the reshapes into
# the consumers this costs ~nothing and keeps the whole integrator's
# (N,3) internals untouched.
st_fl3 = [jnp.asarray(rng.random((3 * N,), np.float32)) for _ in range(10)]


def step_pack(st):
    return [(a.reshape(N, 3) * 1.0001 + 0.01).reshape(3 * N) for a in st]


timed("state10_packflat   ", jax.jit(step_pack), st_fl3)

# ---- 2c. bare dispatch overhead: a trivial program on 8 floats — the
# per-launch floor every segmented bounce pays through the tunnel.
tiny = jnp.zeros(8, jnp.float32)
timed("dispatch tiny      ", jax.jit(lambda x: x + 1.0), tiny)

# ---- 2d. film accumulate layout: band-region dynamic_update_slice add
# on a (H, W, 4) film (minor dim 4 — padded?) vs (4, H, W) planes.
H, W, B = 1088, 1920, 64
film_hw4 = jnp.zeros((H, W, 4), jnp.float32)
film_4hw = jnp.zeros((4, H, W), jnp.float32)
tile_hw4 = jnp.asarray(rng.random((B, W, 4), np.float32))
tile_4hw = jnp.asarray(np.moveaxis(np.asarray(tile_hw4), -1, 0))


def acc_hw4(f, t):
    reg = jax.lax.dynamic_slice(f, (512, 0, 0), (B, W, 4))
    return jax.lax.dynamic_update_slice(f, reg + t, (512, 0, 0))


def acc_4hw(f, t):
    reg = jax.lax.dynamic_slice(f, (0, 512, 0), (4, B, W))
    return jax.lax.dynamic_update_slice(f, reg + t, (0, 512, 0))


timed("film_acc (H,W,4)   ", jax.jit(acc_hw4), film_hw4, tile_hw4)
timed("film_acc (4,H,W)   ", jax.jit(acc_4hw), film_4hw, tile_4hw)

# ---- 3. loop-carry materialization
def loop_n3(b):
    return jax.lax.fori_loop(0, 32, lambda i, b: b * 0.999 + 1.0, b)


def loop_flat(bs):
    return jax.lax.fori_loop(
        0, 32, lambda i, bs: tuple(b * 0.999 + 1.0 for b in bs), bs)


timed("loop32_n3 carry    ", jax.jit(loop_n3), x_n3)
timed("loop32_3xflat carry", jax.jit(loop_flat),
      (x_f[:N], x_f[N:2 * N], x_f[2 * N:]))

print("done ->", _BANK, flush=True)
