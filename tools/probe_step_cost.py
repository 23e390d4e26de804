"""Probe: per-step cost breakdown of the BVH32 traversal on hardware.

VERDICT r4 item 1: main-tree closest-hit measures ~10x above its own
gather roofline (44 ms per 65k wave vs the ~2-5 ms the 7 ns/row/lane
gather model predicts) and nobody has attributed the missing time.
This probe pins each component:

  1. while-loop baselines (the production entry points): plain/chunked
     closest, anyhit (slim state), chain vs batched leaf mode, stack
     sized 10 (old worst case) vs the tree's actual depth.
  2. FIXED-ITERATION attribution: fori_loop over _traverse_step with
     component gates (do_leaf / do_interior / do_stack) — K iterations
     of identical work, no cond effects, so (full - variant) is that
     component's per-step cost.
  3. a bare dependent-gather chain on the same table: the step's
     theoretical floor.

Banked to PROBE_STEP.json. Run standalone (ONE TPU process at a time):
    python tools/probe_step_cost.py
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

_BANK = "/root/repo/PROBE_STEP.json"
if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    _BANK = "/root/repo/PROBE_STEP_cpu_smoke.json"


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


t0 = time.time()
jax.device_put(np.zeros(8, np.float32)).block_until_ready()
print(f"[attach] {time.time()-t0:.1f}s", flush=True)
bank("platform", jax.default_backend())


def timed(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:8.2f} ms", flush=True)
    bank(name.strip(), round(ms, 3))
    return ms


from pathtracer_tpu.integrator import TracedScene  # noqa: E402
from pathtracer_tpu.scene.gltf import load_gltf  # noqa: E402
from pathtracer_tpu.accel import bvhw  # noqa: E402

t0 = time.time()
cam, sd, _ = load_gltf("data/sponza_proc.glb", resolution=(640, 480))
scene = TracedScene.create(sd)
tab = scene.bw_rows
R = int(tab.shape[0])
depth = int(scene.bw_depth)
print(f"[scene] {time.time()-t0:.1f}s rows={R} depth={depth}", flush=True)
bank("rows", R)
bank("depth", depth)

N = 65536
K = int(os.environ.get("PROBE_STEP_K", "16"))
rng = np.random.default_rng(0)
center = np.asarray(0.5 * (np.asarray(sd.p0).min(0) + np.asarray(sd.p0).max(0)))
o_bush = jnp.asarray(np.tile(center[None, :] + np.array([0, 1, 0], np.float32),
                             (N, 1)).astype(np.float32))
dn = rng.normal(size=(N, 3)).astype(np.float32)
dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
d_bush = jnp.asarray(dn)
t_inf = jnp.full((N,), np.inf, jnp.float32)
t_100 = jnp.full((N,), 100.0, jnp.float32)

# ---- 1. while-loop production baselines
_FAST = os.environ.get("PROBE_STEP_FAST", "0") == "1"
for name, kw in (
    ("wl closest chain  sw10", dict(leaf_mode="chain")),
    ("wl closest chain  swD ", dict(stackw=depth, leaf_mode="chain")),
    ("wl closest batched swD", dict(stackw=depth, leaf_mode="batched")),
):
    if _FAST and "chain" in kw.get("leaf_mode", ""):
        continue
    timed(f"[{name}]",
          jax.jit(lambda o, d, kw=kw: bvhw.bvhw_intersect(
              tab, o, d, t_inf, **kw)["t"]), o_bush, d_bush)
for name, kw in (
    ("wl anyhit  chain  swD ", dict(stackw=depth, leaf_mode="chain")),
    ("wl anyhit  batchd swD ", dict(stackw=depth, leaf_mode="batched")),
):
    if _FAST and "chain" in kw.get("leaf_mode", ""):
        continue
    timed(f"[{name}]",
          jax.jit(lambda o, d, kw=kw: bvhw.bvhw_intersect(
              tab, o, d, t_100, any_hit=True, **kw)), o_bush, d_bush)
for name, kw in (
    ("wl closest batched ck8", dict(chunks=8, leaf_mode="batched")),
    ("wl anyhit  batched ck8", dict(chunks=8, any_hit=True,
                                    leaf_mode="batched")),
):
    timed(f"[{name}]",
          jax.jit(lambda o, d, kw=kw: bvhw.bvhw_intersect_chunked(
              tab, o, d,
              t_100 if kw.get("any_hit") else t_inf,
              stackw=depth, **kw)), o_bush, d_bush)

# ---- 2. fixed-iteration component attribution
def fixed_iter(any_hit=False, leaf_mode="chain", stackw=10, **gates):
    def run(o, d):
        st, geom = bvhw._traverse_setup(tab, o, d,
                                        t_100 if any_hit else t_inf,
                                        False, stackw=stackw)
        if any_hit:
            st, geom = bvhw._anyhit_slim(st, geom)
        final = jax.lax.fori_loop(
            0, K,
            lambda i, s: bvhw._traverse_step(tab, s, geom, any_hit, False,
                                             leaf_mode=leaf_mode, **gates),
            st)
        return final["found"]
    return jax.jit(run)


if _FAST:
    print("done (fast mode) ->", _BANK, flush=True)
    sys.exit(0)

base = {}
for name, kw in (
    ("fx full chain   sw10", dict(leaf_mode="chain")),
    ("fx full chain   swD ", dict(stackw=depth, leaf_mode="chain")),
    ("fx full batched swD ", dict(stackw=depth, leaf_mode="batched")),
    ("fx no-leaf      swD ", dict(stackw=depth, do_leaf=False)),
    ("fx no-interior  swD ", dict(stackw=depth, do_interior=False)),
    ("fx no-stack         ", dict(stackw=depth, do_stack=False)),
    ("fx gather-only      ", dict(stackw=depth, do_leaf=False,
                                  do_interior=False, do_stack=False)),
    ("fx anyhit slim  swD ", dict(stackw=depth, any_hit=True)),
):
    ms = timed(f"[{name}] K={K}", fixed_iter(**kw), o_bush, d_bush)
    base[name.strip()] = ms

# ---- 3. bare dependent-gather chain (the floor): child row feeds the
# next gather index, nothing else happens
def gather_chain(o, d):
    idx0 = (o[:, 0] * 0).astype(jnp.int32)

    def body(i, idx):
        row = tab[idx]
        return (row[:, 192].astype(jnp.int32) + idx + i) % R

    idx = jax.lax.fori_loop(0, K, body, idx0)
    return idx


ms_chain = timed(f"[fx bare gather chain] K={K}", jax.jit(gather_chain),
                 o_bush, d_bush)

full = base["fx full chain   swD"]
print("\n--- per-step attribution (65536 lanes, ms/step) ---", flush=True)
attrib = {
    "full_chain": full / K,
    "leaf(chain)": (full - base["fx no-leaf      swD"]) / K,
    "interior_slab": (full - base["fx no-interior  swD"]) / K,
    "stack": (full - base["fx no-stack"]) / K,
    "gather+bookkeeping": base["fx gather-only"] / K,
    "bare_gather": ms_chain / K,
    "batched_leaf_delta": (base["fx full batched swD"] - full) / K,
    "ns_per_lane_per_step_full": full / K * 1e6 / N,
    "ns_per_lane_per_step_gather": ms_chain / K * 1e6 / N,
}
for k, v in attrib.items():
    print(f"  {k}: {v:.4f}", flush=True)
    bank("attrib_" + k, round(float(v), 4))
print("done ->", _BANK, flush=True)
